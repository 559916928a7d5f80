"""Second wave of SQL-surface + pipeline coverage.

Fills operator families the first wave left out:
  * outer-join aggregation and histogram-of-counts (TPC-H Q13 shape)
  * NOT IN anti-join + count(distinct) (Q16 shape)
  * disjunctive (OR-of-ANDs) predicates over a join (Q19 shape)
  * scalar-subquery threshold + NOT EXISTS (Q22 shape)
  * semi-structured JSON extraction (F9 as a data operator, not just
    the API codec)
  * bucketed interval join (operators/interval.py)
  * LSH-bucketed ANN (operators/similarity.py scale path; complements
    sim_ivf_assign)

Same float discipline as sql_queries.py: decimal casts before
arithmetic, round(6) on ratios, identical aliases on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from open_tlm_spark.operators.interval import interval_join
from open_tlm_spark.operators import similarity as S
from open_tlm_spark.plans.pipeline_queries import NORMED_CTE
from open_tlm_spark.plans.registry import register


# ---------------------------------------------------------------- TPC-H Q13
@register(
    "tpch_q13_order_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution: LEFT OUTER join with an
    extra join-side predicate (not a WHERE — customers with zero
    matching orders must survive with count 0), then a histogram of
    the counts.

    Scale: the outer join shuffles both sides on custkey; the first
    aggregation collapses to one row per customer BEFORE the second
    (tiny) shuffle on c_count. count(o_orderkey) counts non-null
    matches only — the outer-join null row contributes 0.
    """
    c = spark.table("customer")
    o = spark.table("orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------- TPC-H Q16
@register(
    "tpch_q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#3'
      AND p.p_type NOT LIKE 'STANDARD%'
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier diversity per part group: NOT-IN anti-join against a
    blacklist + count(distinct) over a negated-predicate dim join.

    Scale: the blacklist subquery is tiny -> broadcast LEFT ANTI join
    (NULL-safe here because s_suppkey is a key, never null); part is
    the dim side -> broadcast inner join; count(distinct) expands to
    a two-phase aggregate (distinct shuffle on group+suppkey, then
    count) — Spark plans that automatically.
    """
    bad = spark.table("supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    p = spark.table("part").filter(
        (F.col("p_brand") != "Brand#3") & (~F.col("p_type").startswith("STANDARD"))
    )
    l = spark.table("lineitem").join(
        broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
    )
    return (
        l.join(broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------- TPC-H Q19
@register(
    "tpch_q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                     * (1 - CAST(l.l_discount AS DECIMAL(6,4)))) AS DECIMAL(38,6))
                AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive predicate over a join (OR of brand/size/quantity
    conjunctions). The planner splits the OR: single-side conjuncts
    (brand/size -> part, quantity range envelope -> lineitem) are
    pushed below the join as partial filters, the full disjunction
    re-checked above — Catalyst does this via constraint propagation;
    part stays broadcast.
    """
    l = spark.table("lineitem")
    p = spark.table("part")
    j = l.join(broadcast(p), l.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#4") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    revenue = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(6,4)")
    )
    return j.filter(cond).agg(
        F.sum(revenue).cast("decimal(38,6)").cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ---------------------------------------------------------------- TPC-H Q22
@register(
    "tpch_q22_dormant_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT avg(c_acctbal) AS thresh
      FROM customer
      WHERE c_acctbal > 0 AND c_nationkey IN (1, 5, 9, 13, 17, 21)
    )
    SELECT c.c_nationkey AS cntry, count(*) AS numcust,
           CAST(CAST(sum(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DECIMAL(38,2))
                AS DOUBLE) AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_nationkey IN (1, 5, 9, 13, 17, 21)
      AND c.c_acctbal > avg_bal.thresh
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_nationkey
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wealthy customers with no urgent orders: scalar-subquery
    threshold (a 1-row broadcast cross join, NOT a collect()
    round-trip — the threshold stays a lazy plan node) + NOT EXISTS
    as a left anti join on filtered orders. (TPC-H proper uses
    "no orders at all"; this dataset has none of those, so the anti
    side is priority-filtered to keep the result non-trivial.)

    Scale: the anti join shuffles customer vs orders on custkey (both
    potentially large — correct); everything else is narrow.
    """
    nations = [1, 5, 9, 13, 17, 21]
    c = spark.table("customer").filter(F.col("c_nationkey").isin(nations))
    thresh = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("thresh"))
    )
    o = (
        spark.table("orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    rich = c.join(broadcast(thresh)).filter(F.col("c_acctbal") > F.col("thresh"))
    dormant = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return dormant.groupBy(F.col("c_nationkey").alias("cntry")).agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(F.col("c_acctbal").cast("decimal(12,2)"))
        .cast("decimal(38,2)")
        .cast("double")
        .alias("totacctbal"),
    )


# ------------------------------------------------------------ JSON extract
@register(
    "events_json_props",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           round(avg(CAST(json_extract(props, '$.k') AS INTEGER)), 6) AS avg_k,
           max(CAST(json_extract(props, '$.k') AS INTEGER)) AS max_k,
           count(CASE WHEN CAST(json_extract(props, '$.k') AS INTEGER) >= 50
                      THEN 1 END) AS n_high
    FROM events
    GROUP BY event_type
    """,
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction (F9 as a query operator): pull a
    typed field out of a JSON string column and aggregate on it.
    get_json_object is JVM-side (Jackson) — no Python in the loop; at
    scale, parse ONCE into a struct column (from_json) at ingest and
    store typed, rather than re-parsing per query."""
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        spark.table("events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg(k), 6).alias("avg_k"),
            F.max(k).alias("max_k"),
            F.count(F.when(k >= 50, 1)).alias("n_high"),
        )
    )


# -------------------------------------------------------- interval join
@register(
    "interval_join_error_windows",
    oracle="""
    WITH w AS (
      SELECT event_id AS window_id, ts AS w_start,
             ts + INTERVAL 10 MINUTE AS w_end
      FROM events
      WHERE event_type = 'error' AND event_id % 7 = 0
    )
    SELECT w.window_id,
           count(e.event_id) AS n_events,
           round(avg(e.value), 6) AS avg_value
    FROM w
    JOIN events e ON e.ts >= w.w_start AND e.ts < w.w_end
    GROUP BY w.window_id
    """,
)
def interval_join_error_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed interval join (operators/interval.py): activity inside
    the 10 minutes after each (sampled) error event. The DuckDB oracle
    states the plain theta-join semantics; the Spark plan is the
    bucketed equi-join rewrite — same rows, no BroadcastNestedLoop,
    scales to both sides large."""
    ev = spark.table("events")
    w = (
        ev.filter((F.col("event_type") == "error") & (F.col("event_id") % 7 == 0))
        .select(
            F.col("event_id").alias("window_id"),
            F.col("ts").alias("w_start"),
            (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("w_end"),
        )
    )
    joined = interval_join(
        ev.select(F.col("event_id").alias("e_id"), "ts", "value"),
        w,
        ts_col="ts",
        start_col="w_start",
        end_col="w_end",
        bucket_seconds=600,
        closed="left",
    )
    return joined.groupBy("window_id").agg(
        F.count("e_id").alias("n_events"),
        F.round(F.avg("value"), 6).alias("avg_value"),
    )


# ------------------------------------------------------------ LSH ANN
@register(
    "sim_lsh_topk",
    oracle=f"""{NORMED_CTE},
    hp AS (SELECT vec_id AS h_id, nvec AS hvec FROM normed WHERE vec_id < 8),
    sig AS (
      SELECT a.vec_id,
             sum(CASE WHEN round(list_sum(list_transform(range(1, 65),
                          i -> a.nvec[i] * hp.hvec[i])), 6) >= 0
                      THEN 1 << h_id ELSE 0 END)::BIGINT AS sig
      FROM normed a, hp
      GROUP BY a.vec_id
    ),
    corpus AS (SELECT n.vec_id, n.nvec, s.sig
               FROM normed n JOIN sig s USING (vec_id)),
    q AS (SELECT vec_id AS query_id, nvec AS qvec, sig
          FROM corpus WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, c.vec_id,
             round(list_sum(list_transform(range(1, 65),
                   i -> q.qvec[i] * c.nvec[i])), 6) AS cos_sim
      FROM corpus c JOIN q ON c.sig = q.sig AND c.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, cos_sim,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos_sim DESC, vec_id) AS rank
    FROM scored
    QUALIFY rank <= 10
    """,
)
def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN (the other scale path beside IVF): 8
    hyperplane sign bits -> 256 buckets; candidates = same bucket;
    exact cosine + rank within bucket only. Hyperplanes are the 8
    lowest-vec_id vectors (deterministic, oracle-reproducible); a
    production index uses random Gaussian planes and multi-probe.
    The signature corpus is session-shared with the recall eval
    (r13, plans/shared_subtrees)."""
    from open_tlm_spark.plans.shared_subtrees import shared_lsh_signatures

    emb = spark.table("embeddings")
    corpus = shared_lsh_signatures(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id")
    )
    return S.lsh_bucket_topk(corpus, queries, k=10)


# --------------------------------------------- composed cleaning pipeline
@register(
    "docs_clean_pipeline",
    oracle=r"""
    WITH feats AS (
      SELECT doc_id, source, text,
             len(list_filter(string_split_regex(text, '\s+'), t -> t <> ''))
               AS n_words,
             len(regexp_extract_all(lower(text),
                 '\b(the|a|and|of|to|in|is|it)\b')) AS stop_hits,
             len(regexp_extract_all(lower(text), '\b(der|die|und|von|das)\b')) AS h_de,
             len(regexp_extract_all(lower(text), '\b(the|and|of|to|in)\b'))    AS h_en,
             len(regexp_extract_all(lower(text), '\b(el|la|de|que|los)\b'))    AS h_es,
             len(regexp_extract_all(lower(text), '\b(le|la|et|les|des)\b'))    AS h_fr
      FROM documents
    ),
    quality AS (
      SELECT * FROM feats
      WHERE n_words >= 20 AND stop_hits / n_words >= 0.01
    ),
    english AS (
      SELECT * FROM quality
      WHERE greatest(h_de, h_en, h_es, h_fr) > 0
        AND NOT (h_fr >= h_es AND h_fr >= h_en AND h_fr >= h_de)
        AND NOT (h_es >= h_en AND h_es >= h_de)
        AND h_en >= h_de
    ),
    deduped AS (
      SELECT * FROM english
      QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS total_tokens,
           round(avg(n_words), 6) AS avg_tokens
    FROM deduped
    GROUP BY source
    """,
)
def docs_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north-star composition, end-to-end in ONE lazy plan:
    quality filter (Gopher-style length + stopword density) ->
    language gate (marker-lexicon langid == 'en') -> exact dedup
    (keeper = lowest doc_id per text) -> per-source corpus stats.

    Everything is JVM column math; the only shuffles are the dedup
    window (partitioned by text hash) and the final tiny groupBy.
    At 100 TB: swap the exact-dup window key for a fingerprint and
    run the same plan unchanged.

    r14 (guide §2.4, VERDICT r13 "Next round" #1): the
    tokenize/stopword/langid signals come from the session-shared
    quality-signal frame (plans/shared_subtrees) joined back onto the
    corpus by doc_id — locally a broadcast of the cached frame; at
    100 TB the persisted signal artifact co-partitions with the
    corpus on doc_id. `text` itself must ride from the base table
    regardless (it is the dedup window key), so the scan does not get
    narrower — what the join removes is the per-query re-tokenize +
    4-regex langid pass. Measured min-of-5 idle A/B at sf0.1 (signal
    view primed, as the bench pre-pass does): 1.25 s -> 1.14 s, rows
    identical."""
    from pyspark.sql.window import Window

    from open_tlm_spark.plans.shared_subtrees import shared_quality_signals

    sig = shared_quality_signals(spark, sf_dir).select(
        "doc_id", "n_words", "stop_hits", "lang_pred"
    )
    feats = spark.table("documents").select(
        "doc_id", "source", "text"
    ).join(sig, "doc_id")
    quality = feats.filter(
        (F.col("n_words") >= 20)
        & (F.col("stop_hits") / F.col("n_words") >= 0.01)
    )
    english = quality.filter(F.col("lang_pred") == "en")
    w = Window.partitionBy("text").orderBy("doc_id")
    deduped = (
        english.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    return deduped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").cast("long").alias("total_tokens"),
        F.round(F.avg("n_words"), 6).alias("avg_tokens"),
    )
