"""Training-pipeline and analytics queries, batch 2: context-window
chunking, retention cohorts, RFM segmentation, CUSUM change
detection, per-source capping, TF-IDF keyword extraction.

Extends the §2 surface with the remaining steps a corpus-to-model
pipeline runs between curation and the dataloader (chunking, caps,
per-doc keywords) plus the product-analytics shapes a TSDB front-end
is asked for next (cohorts, drift detection, customer segments).

Float-determinism conventions follow the registry docstring: exact
DECIMAL sums for anything order-dependent, round(…, 6) on both
sides, unique tiebreaks in every window/top-k ordering, and integer
outputs cast to BIGINT on both sides (DuckDB sum()/ntile()/
row_number() dtypes differ from Spark's defaults).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from open_tlm_spark.operators import curation as C
from open_tlm_spark.plans.registry import register

_TOKS_CTE = r"""
    toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         t -> t <> '') AS w
      FROM documents
    )
"""


# ------------------------------------------------- document chunking
_CHUNK_SIZE = 64
_CHUNK_STRIDE = 48


@register(
    "chunk_documents",
    oracle=rf"""
    WITH {_TOKS_CTE},
    t AS (SELECT doc_id, w, len(w) AS n FROM toks WHERE len(w) >= 1),
    ch AS (
      SELECT doc_id, i AS chunk_id,
             least({_CHUNK_SIZE}, n - i * {_CHUNK_STRIDE}) AS chunk_tokens,
             md5(array_to_string(
                 list_slice(w, i * {_CHUNK_STRIDE} + 1,
                            least(i * {_CHUNK_STRIDE} + {_CHUNK_SIZE}, n)),
                 ' ')) AS chunk_md5
      FROM t, UNNEST(range(0,
             CASE WHEN n <= {_CHUNK_SIZE} THEN 1
                  ELSE CAST(floor((n - {_CHUNK_SIZE} + {_CHUNK_STRIDE} - 1)
                                  / {_CHUNK_STRIDE}) AS BIGINT) + 1
             END)) AS u(i)
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(chunk_tokens AS BIGINT) AS chunk_tokens, chunk_md5
    FROM ch
    """,
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: split every document into
    {_CHUNK_SIZE}-token chunks with a {_CHUNK_STRIDE}-token stride
    (16-token overlap) — the step that turns curated documents into
    model-ready sequences (operators/curation.py chunk_by_tokens).
    Pure narrow explode, zero shuffles; the chunk md5 keeps the
    output narrow while still value-checking the exact slice."""
    return C.chunk_by_tokens(
        spark.table("documents"), _CHUNK_SIZE, _CHUNK_STRIDE
    )


# ------------------------------------------------- retention cohorts
@register(
    "events_retention_cohorts",
    oracle="""
    WITH act AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS day
      FROM events
    ),
    f AS (SELECT user_id, min(day) AS cohort FROM act GROUP BY user_id)
    SELECT f.cohort AS cohort_date,
           date_diff('day', f.cohort, act.day) AS offset_days,
           count(*) AS n_users
    FROM act JOIN f USING (user_id)
    GROUP BY 1, 2
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active day,
    counted on each later day-offset they return — the standard
    retention triangle. Plan: one distinct on (user, day) (shuffle 1,
    carries one row per user-day, not per event), a per-user min
    reusing that exchange (same key prefix), an equi-join back on
    user_id, and the final cohort aggregate. No window functions, so
    nothing serializes on a hot cohort at scale."""
    ev = spark.table("events")
    act = ev.select(
        "user_id", F.date_trunc("DAY", F.col("ts")).alias("day")
    ).distinct()
    f = act.groupBy("user_id").agg(F.min("day").alias("cohort"))
    return (
        act.join(f, "user_id")
        .groupBy(
            F.col("cohort").alias("cohort_date"),
            F.datediff(F.col("day"), F.col("cohort"))
            .cast("long")
            .alias("offset_days"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# ------------------------------------------------- RFM segmentation
@register(
    "orders_rfm_segments",
    oracle="""
    WITH per AS (
      SELECT o_custkey,
             max(o_orderdate) AS r,
             count(*) AS f,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS m
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey,
           ntile(4) OVER (ORDER BY r DESC, o_custkey) AS r_quartile,
           ntile(4) OVER (ORDER BY f DESC, o_custkey) AS f_quartile,
           ntile(4) OVER (ORDER BY m DESC, o_custkey) AS m_quartile
    FROM per
    """,
)
def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per customer, recency (last order
    date), frequency (order count) and monetary (DECIMAL-exact spend),
    each bucketed into global quartiles (1 = best). Quartiles are
    ntile(4) with o_custkey as tiebreak — total order, identical in
    both engines. The windows are global (no PARTITION BY) which is
    correct-but-serial; it runs on the per-customer aggregate (a
    dimension-sized frame, already reduced by the first shuffle), not
    the fact table — at warehouse scale the same cut-points would come
    from approx quantiles and a broadcast range lookup instead."""
    per = (
        spark.table("orders")
        .groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("r"),
            F.count(F.lit(1)).alias("f"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("m"),
        )
    )
    return per.select(
        "o_custkey",
        F.ntile(4)
        .over(Window.orderBy(F.col("r").desc(), "o_custkey"))
        .cast("long")
        .alias("r_quartile"),
        F.ntile(4)
        .over(Window.orderBy(F.col("f").desc(), "o_custkey"))
        .cast("long")
        .alias("f_quartile"),
        F.ntile(4)
        .over(Window.orderBy(F.col("m").desc(), "o_custkey"))
        .cast("long")
        .alias("m_quartile"),
    )


# ------------------------------------------------- CUSUM drift
_CUSUM_BIN_S = 3600
_CUSUM_K = "0.5"  # slack, in sigma units (string → exact DECIMAL literal)
_CUSUM_H = "5.0"  # alarm threshold


@register(
    "ts_cusum_changepoints",
    oracle=f"""
    WITH binned AS (
      SELECT event_type AS dataset_id,
             CAST(floor(epoch_us(ts) / ({_CUSUM_BIN_S} * 1000000.0)) AS BIGINT)
               * {_CUSUM_BIN_S} AS bin_ts,
             CAST(round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                        / count(*), 6) AS DECIMAL(18,6)) AS v
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT dataset_id, count(*) AS n,
             sum(v) AS s1,
             sum(CAST(v * v AS DECIMAL(38,12))) AS s2
      FROM binned GROUP BY dataset_id
    ),
    z AS (
      SELECT b.dataset_id, b.bin_ts,
             CAST(round((CAST(b.v AS DOUBLE) - CAST(s.s1 AS DOUBLE) / s.n)
                   / sqrt((CAST(s.s2 AS DOUBLE)
                           - CAST(s.s1 AS DOUBLE) * CAST(s.s1 AS DOUBLE) / s.n)
                          / (s.n - 1)), 6) AS DECIMAL(18,6)) AS z
      FROM binned b JOIN stats s USING (dataset_id)
    ),
    c AS (
      SELECT dataset_id, bin_ts,
             sum(z - {_CUSUM_K}) OVER (PARTITION BY dataset_id ORDER BY bin_ts
                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM z
    ),
    s AS (
      SELECT dataset_id, bin_ts,
             cum - least(CAST(0 AS DECIMAL(18,6)),
                         min(cum) OVER (PARTITION BY dataset_id ORDER BY bin_ts
                             ROWS UNBOUNDED PRECEDING)) AS cusum
      FROM c
    )
    SELECT dataset_id, bin_ts, round(CAST(cusum AS DOUBLE), 6) AS cusum
    FROM s WHERE cusum > {_CUSUM_H}
    """,
)
def ts_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detection per series: hourly bin means
    are standardized against the series' own mean/std (DECIMAL-exact
    sums), then the classic recursion S_t = max(0, S_{{t-1}} + z_t - k)
    is computed WITHOUT sequential state via the prefix identity
    S_t = C_t - min(0, min_{{j<=t}} C_j) where C is the running sum of
    (z_t - k) — two ordered windows (cumulative sum + running min)
    instead of an inherently serial scan, both partitioned by series.
    All window arithmetic stays in DECIMAL, so the prefix sums are
    exact and engine-identical; flagged bins are where S exceeds h=5
    sigma-units. Plan: one bin aggregate, one tiny stats broadcast,
    one window sort per series — no UDF, no driver loop."""
    ev = spark.table("events")
    dec = F.col("value").cast("decimal(18,6)")
    binned = (
        ev.groupBy(
            F.col("event_type").alias("dataset_id"),
            (
                F.floor(
                    F.unix_micros("ts") / F.lit(_CUSUM_BIN_S * 1_000_000.0)
                ).cast("long")
                * _CUSUM_BIN_S
            ).alias("bin_ts"),
        )
        .agg(
            F.round(F.sum(dec).cast("double") / F.count(F.lit(1)), 6)
            .cast("decimal(18,6)")
            .alias("v")
        )
    )
    stats = binned.groupBy("dataset_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s1"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,12)")).alias("s2"),
    )
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    mean = s1d / F.col("n")
    std = F.sqrt((s2d - s1d * s1d / F.col("n")) / (F.col("n") - 1))
    # stats is one row per series — no broadcast hint (AQE decides).
    z = binned.join(stats, "dataset_id").select(
        "dataset_id",
        "bin_ts",
        F.round((F.col("v").cast("double") - mean) / std, 6)
        .cast("decimal(18,6)")
        .alias("z"),
    )
    w = (
        Window.partitionBy("dataset_id")
        .orderBy("bin_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    k = F.lit(_CUSUM_K).cast("decimal(18,6)")
    c = z.select(
        "dataset_id", "bin_ts", F.sum(F.col("z") - k).over(w).alias("cum")
    )
    cusum = F.col("cum") - F.least(
        F.lit(0).cast("decimal(18,6)"), F.min("cum").over(w)
    )
    out = c.select("dataset_id", "bin_ts", cusum.alias("cusum"))
    return out.filter(
        F.col("cusum") > F.lit(_CUSUM_H).cast("decimal(18,6)")
    ).select(
        "dataset_id",
        "bin_ts",
        F.round(F.col("cusum").cast("double"), 6).alias("cusum"),
    )


# ------------------------------------------------- per-source caps
_CAP_N = 75


@register(
    "cap_per_source",
    oracle=f"""
    WITH rk AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    )
    SELECT doc_id, source, rk FROM rk WHERE rk <= {_CAP_N}
    """,
)
def cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap: keep at most {_CAP_N} docs per source,
    chosen by deterministic hash order (md5 of doc_id, id tiebreak) —
    the anti-domination guard that stops one crawl domain from
    swamping the mixture, reproducible from ids alone. One window
    shuffle on source; at warehouse scale the rank-then-filter form
    pushes the limit into the sort (partial top-K per map task) since
    only {_CAP_N} rows per key survive."""
    docs = spark.table("documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select(
            "doc_id",
            "source",
            F.row_number().over(w).cast("long").alias("rk"),
        )
        .filter(F.col("rk") <= _CAP_N)
    )


# ------------------------------------------------- TF-IDF keywords
_TFIDF_K = 3


@register(
    "docs_tfidf_topk",
    oracle=rf"""
    WITH {_TOKS_CTE},
    tok AS (SELECT doc_id, unnest(w) AS token FROM toks),
    tf AS (SELECT doc_id, token, count(*) AS tf
           FROM tok GROUP BY doc_id, token),
    df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token,
             round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
      FROM tf JOIN df USING (token), n
    ),
    rk AS (
      SELECT doc_id, token, tfidf,
             row_number() OVER (PARTITION BY doc_id
                 ORDER BY tfidf DESC, token) AS rk
      FROM scored
    )
    SELECT doc_id, token, tfidf, rk FROM rk WHERE rk <= {_TFIDF_K}
    """,
)
def docs_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-{_TFIDF_K} TF-IDF keywords — the document-
    fingerprinting / topic-tagging step. TF from one (doc, token)
    aggregate; DF re-aggregated from TF's output (zero extra passes
    over text — the TF frame is strictly smaller); the DF table is
    vocab-sized (scales with the corpus), so it joins back on token
    with no broadcast hint — AQE broadcasts while it fits, and the
    join key is the one DF was aggregated on, so the shuffle-join
    path reuses TF's exchange. n_docs is a 1-row frame cross-join-
    broadcast into the plan (no eager .count(); building the query
    launches no job). Ranking orders by the ROUNDED score (6 dp) with
    token tiebreak so cross-engine ulp noise in ln() can't reorder
    ties. One text-side shuffle + one window on doc_id."""
    from open_tlm_spark.plans.shared_subtrees import token_stream

    # r13 (guide §2.4): token stream from the session-shared
    # tokenized corpus (tokenize once per session).
    tok = token_stream(spark, sf_dir).select("doc_id", "token")
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = (
        spark.table("documents")
        .agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    )
    scored = (
        tf.join(df, "token")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "token")
    return (
        scored.select(
            "doc_id",
            "token",
            "tfidf",
            F.row_number().over(w).cast("long").alias("rk"),
        )
        .filter(F.col("rk") <= _TFIDF_K)
    )


# ------------------------------------------------- bigram LM quality
@register(
    "quality_bigram_logprob",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         t -> t <> '') AS w
      FROM documents
    ),
    bg AS (
      SELECT doc_id, w[i+1] AS w1, w[i+1] || ' ' || w[i+2] AS pair
      FROM toks, UNNEST(range(0, len(w) - 1)) AS u(i)
      WHERE len(w) >= 2
    ),
    c2 AS (SELECT pair, count(*) AS c2 FROM bg GROUP BY pair),
    c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
    scored AS (
      SELECT bg.doc_id,
             round(ln(CAST(c2.c2 AS DOUBLE) / c1.c1), 6) AS logp
      FROM bg JOIN c2 USING (pair) JOIN c1 USING (w1)
    )
    SELECT doc_id,
           count(*) AS n_bigrams,
           round(CAST(sum(CAST(logp AS DECIMAL(18,6))) AS DOUBLE)
                 / count(*), 6) AS avg_logp
    FROM scored GROUP BY doc_id
    """,
)
def quality_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM document scoring — the next step up from the unigram
    perplexity proxy: per doc, the mean log conditional probability
    ln(c(w1 w2)/c(w1·)) of its adjacent token pairs under corpus
    counts. Pair counts come from ONE aggregate over the exploded
    bigram stream; prefix counts re-aggregate the (much smaller) pair
    table rather than re-scanning text; both broadcast back onto the
    stream. Per-token logp is rounded then DECIMAL-summed —
    order-independent, engine-identical."""
    from open_tlm_spark.operators.text import bigrams
    from open_tlm_spark.plans.shared_subtrees import (
        shared_bigram_counts,
        shared_tokens,
    )

    # r13 (guide §2.4): the bigram stream explodes the session-shared
    # tokenized corpus; the pair-count table is the session-shared
    # bigram frame (also BPE's and PMI's) — c2 aggregates nothing.
    tok = shared_tokens(spark, sf_dir).select("doc_id", "w")
    bg = tok.select(
        "doc_id", F.explode(bigrams(F.col("w"))).alias("pair")
    ).withColumn("w1", F.split(F.col("pair"), " ").getItem(0))
    c2 = shared_bigram_counts(spark, sf_dir).withColumnRenamed("c", "c2")
    c1 = (
        c2.withColumn("w1", F.split(F.col("pair"), " ").getItem(0))
        .groupBy("w1")
        .agg(F.sum("c2").alias("c1"))
    )
    # c2/c1 are bigram-/unigram-vocab-sized (scale with the corpus) —
    # no broadcast hints; each joins back on its own aggregation key,
    # so AQE either broadcasts (while they fit) or reuses the
    # exchange for a shuffle join.
    scored = (
        bg.join(c2, "pair")
        .join(c1, "w1")
        .select(
            "doc_id",
            F.round(
                F.log(F.col("c2").cast("double") / F.col("c1")), 6
            ).alias("logp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(
            F.sum(F.col("logp").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_logp"),
    )


# ------------------------------------------------- market basket
_BASKET_TOP = 25


@register(
    "basket_part_pairs",
    oracle=f"""
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    SELECT a.l_partkey AS part_a, c.l_partkey AS part_b,
           count(*) AS n_orders
    FROM b a JOIN b c
      ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
    GROUP BY 1, 2
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT {_BASKET_TOP}
    """,
)
def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the top part pairs appearing in
    the same order — the counting core of association-rule mining.
    ONE collect_set aggregate keyed by order builds each basket
    (dedups line-level duplicates in the same shuffle), then the
    pairs come from a narrow in-array expansion over the sorted
    basket (part_a < part_b by construction). TPC-H order width is
    bounded (≤7 lines), so the expansion is O(width²) per row and the
    pair stream is linear in orders. vs the distinct + self-join
    form: one basket shuffle instead of two passes over the distinct
    frame, no join — measured 2.0 s -> 1.8 s warm at sf0.1 with
    identical output. One aggregate then TakeOrderedAndProject.
    r14 (guide §2.4): the basket aggregate is the session-shared
    order-basket view (plans/shared_subtrees) — the same expression
    orders_association_rules starts from, computed once."""
    from open_tlm_spark.plans.shared_subtrees import shared_order_baskets

    arr = shared_order_baskets(spark, sf_dir)
    pairs = arr.select(
        F.explode(
            F.expr(
                "flatten(transform(parts, (x, i) -> "
                "transform(slice(parts, i + 2, size(parts)), "
                "y -> struct(x AS part_a, y AS part_b))))"
            )
        ).alias("p")
    ).select("p.part_a", "p.part_b")
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(_BASKET_TOP)
    )


# ------------------------------------------------- embedding QA
def _cohesion_oracle() -> str:
    """Per-component DECIMAL centroid sums (order-independent), then
    an unrolled 64-term dot product — the same left-associated
    chain the Spark side builds, so float results are bit-identical."""
    dim = 64
    cols = ",\n             ".join(
        f"round(CAST(sum(CAST(vec[{i + 1}] AS DECIMAL(28,12))) AS DOUBLE)"
        f" / count(*), 6) AS c{i}"
        for i in range(dim)
    )
    dot = " + ".join(f"v.vec[{i + 1}] * c.c{i}" for i in range(dim))
    cn = " + ".join(f"c.c{i} * c.c{i}" for i in range(dim))
    return f"""
    WITH vecs AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS vec FROM embeddings
    ),
    cent AS (
      SELECT label,
             {cols}
      FROM vecs GROUP BY label
    ),
    cos AS (
      SELECT v.label,
             CAST(round(({dot}) / sqrt({cn}), 6) AS DECIMAL(18,6)) AS cc
      FROM vecs v JOIN cent c USING (label)
    )
    SELECT label,
           count(*) AS n_vecs,
           round(CAST(sum(cc) AS DOUBLE) / count(*), 6) AS mean_cos,
           CAST(min(cc) AS DOUBLE) AS min_cos,
           CAST(count(*) FILTER (WHERE cc < 0) AS BIGINT) AS n_anti
    FROM cos GROUP BY label
    """


@register("embedding_label_cohesion", oracle=_cohesion_oracle())
def embedding_label_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-table QA: per label, the mean/min cosine of each
    vector to its label centroid and the count of anti-aligned members
    (cos < 0) — the mislabeled-vector / collapsed-class detector run
    before trusting labels for blocking or ANN training. Centroids
    are per-component DECIMAL-exact mean sums (64 agg expressions in
    ONE aggregate — the minhash signature pattern); the 10-row
    centroid frame broadcasts back and each cosine is an unrolled
    codegen'd 64-term chain, identical in both engines. Two shuffles
    total (centroid agg + final per-label agg), both map-side
    combinable, linear at any corpus size.

    r14 (guide §2.3 "narrower types", VERDICT r13 "Next round" #7):
    the per-element cast is decimal(18,12) — precision <= 18 keeps
    Spark's Decimal in its compact long representation through the
    cast, where the old decimal(28,12) forced the BigDecimal path per
    element. The SUM result type is input-precision+10 = (28,12)
    either way, so every summed value (and the oracle's
    DECIMAL(28,12) mirror) is bit-identical as long as
    |component| < 10^6 — embeddings are unit-scale (measured
    |x| <= 0.58 at every SF), six integer digits of headroom, and the
    DuckDB oracle hash-pins it. Measured min-of-5 idle A/B at sf0.1:
    3.20 s -> 2.39 s, rows identical."""
    dim = 64
    emb = spark.table("embeddings")
    sums = [
        F.round(
            F.sum(
                F.element_at("embedding", i + 1).cast("decimal(18,12)")
            ).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias(f"c{i}")
        for i in range(dim)
    ]
    cent = emb.groupBy("label").agg(*sums)
    vterm = [
        F.element_at("embedding", i + 1).cast("double") * F.col(f"c{i}")
        for i in range(dim)
    ]
    dot = vterm[0]
    for t in vterm[1:]:
        dot = dot + t
    cterm = [F.col(f"c{i}") * F.col(f"c{i}") for i in range(dim)]
    cn = cterm[0]
    for t in cterm[1:]:
        cn = cn + t
    cos = emb.join(F.broadcast(cent), "label").select(
        "label",
        F.round(dot / F.sqrt(cn), 6).cast("decimal(18,6)").alias("cc"),
    )
    return cos.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.sum("cc").cast("double") / F.count(F.lit(1)), 6).alias(
            "mean_cos"
        ),
        F.min("cc").cast("double").alias("min_cos"),
        F.count(F.when(F.col("cc") < 0, 1)).alias("n_anti"),
    )


# ------------------------------------------------- Zipf fit
_ZIPF_TOP = 200


@register(
    "documents_zipf_fit",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         t -> t <> '') AS w
      FROM documents
    ),
    tok AS (SELECT unnest(w) AS token FROM toks),
    freq AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, token) AS r
      FROM freq
      QUALIFY r <= {_ZIPF_TOP}
    ),
    xy AS (
      SELECT CAST(round(ln(r), 6) AS DECIMAL(18,6)) AS x,
             CAST(round(ln(c), 6) AS DECIMAL(18,6)) AS y
      FROM ranked
    ),
    s AS (
      SELECT count(*) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(CAST(x * y AS DECIMAL(38,12))) AS sxy,
             sum(CAST(x * x AS DECIMAL(38,12))) AS sxx
      FROM xy
    )
    SELECT n AS n_top,
           round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
                 6) AS slope,
           round((CAST(sy AS DOUBLE)
                  - ((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                    * CAST(sx AS DOUBLE)) / n, 6) AS intercept
    FROM s
    """,
)
def documents_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: least-squares slope
    of ln(freq) against ln(rank) for the top-{_ZIPF_TOP} tokens — the
    one-number corpus health check (natural text sits near slope -1;
    boilerplate-heavy or synthetic corpora deviate). Frequency counts
    are one aggregate; ranking is a TakeOrdered top-k; the regression
    runs on DECIMAL-exact sums of 6-dp-rounded log coordinates, so
    both engines produce identical moments and the closed-form
    slope/intercept agree bit-for-bit."""
    from pyspark.sql import Window
    from open_tlm_spark.operators.text import tokens
    from open_tlm_spark.session import fan_out

    docs = fan_out(spark.table("documents"))
    tok = docs.select(
        F.explode(tokens(F.lower(F.col("text")))).alias("token")
    )
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    ranked = (
        freq.select(
            "c",
            F.row_number()
            .over(Window.orderBy(F.col("c").desc(), "token"))
            .alias("r"),
        )
        .filter(F.col("r") <= _ZIPF_TOP)
    )
    xy = ranked.select(
        F.round(F.log("r"), 6).cast("decimal(18,6)").alias("x"),
        F.round(F.log("c"), 6).cast("decimal(18,6)").alias("y"),
    )
    s = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,12)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,12)")).alias("sxx"),
    )
    n = F.col("n")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        n.alias("n_top"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
    )


# ------------------------------------------------- length histogram
@register(
    "docs_length_histogram",
    oracle=r"""
    WITH t AS (
      SELECT len(list_filter(string_split_regex(lower(text), '\s+'),
                             x -> x <> '')) AS n_tok
      FROM documents
    )
    SELECT CAST(len(bin(n_tok)) - 1 AS BIGINT) AS bucket,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           CAST(min(n_tok) AS BIGINT) AS min_tokens,
           CAST(max(n_tok) AS BIGINT) AS max_tokens
    FROM t WHERE n_tok >= 1
    GROUP BY bucket
    """,
)
def docs_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two document-length histogram (bucket k holds docs
    with 2^k ≤ tokens < 2^(k+1)) — the length-distribution audit run
    before choosing chunk sizes and packing budgets. The bucket is the
    bit length of the integer token count (length of its binary
    string, minus one) — pure integer math, immune to the float-
    boundary hazard of floor(log2(n)) at exact powers of two. One
    narrow projection + one aggregate."""
    from open_tlm_spark.operators.text import tokens

    docs = spark.table("documents")
    n_tok = F.size(tokens(F.lower(F.col("text"))))
    t = docs.select(n_tok.alias("n_tok")).filter(F.col("n_tok") >= 1)
    bucket = (F.length(F.bin(F.col("n_tok"))) - 1).cast("long")
    return t.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.min("n_tok").cast("long").alias("min_tokens"),
        F.max("n_tok").cast("long").alias("max_tokens"),
    )


# ------------------------------------------------- ANN recall eval
def _recall_oracle() -> str:
    from open_tlm_spark.plans.pipeline_queries import NORMED_CTE

    return f"""{NORMED_CTE},
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
    lsh_scored AS (
      SELECT q.query_id, c.vec_id,
             round(list_sum(list_transform(range(1, 65),
                   i -> q.qvec[i] * c.nvec[i])), 6) AS cos_sim
      FROM corpus c JOIN q ON c.sig = q.sig AND c.vec_id <> q.query_id
    ),
    lsh AS (
      SELECT query_id, vec_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, vec_id) AS rank
      FROM lsh_scored QUALIFY rank <= 10
    ),
    gt_scored AS (
      SELECT q.query_id, a.vec_id,
             round(list_sum(list_transform(range(1, 65),
                   i -> q.qvec[i] * a.nvec[i])), 6) AS cos_sim
      FROM normed a, q
      WHERE a.vec_id <> q.query_id
    ),
    gt AS (
      SELECT query_id, vec_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, vec_id) AS rank
      FROM gt_scored QUALIFY rank <= 10
    )
    SELECT g.query_id,
           count(*) AS n_gt,
           CAST(count(l.vec_id) AS BIGINT) AS n_hit,
           round(count(l.vec_id) / CAST(count(*) AS DOUBLE), 6) AS recall
    FROM gt g LEFT JOIN lsh l
      ON g.query_id = l.query_id AND g.vec_id = l.vec_id
    GROUP BY g.query_id
    """


@register("sim_lsh_recall_eval", oracle=_recall_oracle())
def sim_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation: recall@10 of the LSH-bucketed search
    against the exact brute-force ground truth, per query vector —
    the measurement that justifies (or vetoes) shipping the
    approximate path. Composes the two existing operators
    (similarity.brute_force_topk, similarity.lsh_bucket_topk) and
    joins their rankings; the oracle replays both pipelines in SQL.
    Both rankings are deterministic (rounded cosines, vec_id
    tiebreaks), so recall is exact — not a statistical estimate."""
    from open_tlm_spark.operators import similarity as S
    from open_tlm_spark.plans.shared_subtrees import (
        shared_bruteforce_lo,
        shared_lsh_signatures,
    )

    emb = spark.table("embeddings")
    corpus = shared_lsh_signatures(spark, sf_dir)
    q_ids = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id")
    )
    lsh = S.lsh_bucket_topk(corpus, q_ids, k=10).select(
        "query_id", "vec_id", F.lit(1).alias("_hit")
    )
    # r13: the exact ground truth is the session-shared brute-force
    # frame (also the sim_topk_bruteforce result) — one corpus pass.
    gt = shared_bruteforce_lo(spark, sf_dir).select("query_id", "vec_id")
    j = gt.join(lsh, ["query_id", "vec_id"], "left")
    return j.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_gt"),
        F.count("_hit").cast("long").alias("n_hit"),
        F.round(
            F.count("_hit") / F.count(F.lit(1)).cast("double"), 6
        ).alias("recall"),
    )
