"""Corpus hygiene, linkage, and dataset-maintenance queries (round 7).

Extensions beyond reference parity (the reference is a telemetry
store, src/index.py — it has no corpus tooling): the maintenance jobs
a recurring 100 TB training-data pipeline runs BETWEEN curation
passes — fuzzy benchmark decontamination, cross-snapshot corpus
diffing, incremental (arrival-ordered) near-dup detection, robust
outlier audits, record linkage, skyline/Pareto selection, cohort
revenue tracking, optimizer-statistics histograms, and event-stream
hygiene. Every query carries a full DuckDB oracle; float ties follow
the repo's floor-half-up 6-dp discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from open_tlm_spark.operators import dedup as D
from open_tlm_spark.plans.pipeline_queries import SHINGLES_CTE
from open_tlm_spark.plans.registry import register


def _half_up6(c) -> F.Column:
    """Tie-rule-free 6-dp rounding (floor half-up): exact-rational
    ratios (int/int, decimal/int) land on .5-ulp round() boundaries
    where Spark/numpy round half-even but DuckDB rounds half-up."""
    return F.floor(c * 1_000_000 + F.lit(0.5)) / 1_000_000.0


_HALF_UP6_SQL = "floor(({expr}) * 1000000 + 0.5) / 1000000.0"


# ------------------------------------------- MinHash fuzzy decontamination
# Deterministic holdout (same pattern as decontaminate_ngrams in
# plans/curation_queries.py, which holds out 1/97): here 1/7 of the
# corpus plays the benchmark so that planted near-dup pairs straddle
# the train/bench boundary at every test scale factor.
_BENCH_MOD = 7


def _bands_sql(rel: str = "sig") -> str:
    """DuckDB banding rows over a MinHash signature relation —
    mirrors dedup.lsh_bands (4 bands x 3 rows of sig_j columns)."""
    rows = []
    for b in range(D.NUM_BANDS):
        cols = " || '|' || ".join(
            f"sig_{b * D.BAND_ROWS + r}" for r in range(D.BAND_ROWS)
        )
        rows.append(
            f"SELECT doc_id, {b} AS band_id, md5({cols}) AS band_key "
            f"FROM {rel}"
        )
    return "\n      UNION ALL\n      ".join(rows)


_SIG_COLS_SQL = ",\n             ".join(
    f"min((w1 + {j} * w2) % {D.KM_PRIME}) AS sig_{j}"
    for j in range(D.NUM_HASHES)
)

# Shared CTE chain: shingles -> KM hash words -> signatures -> bands.
_MINHASH_CTES = f"""
    {SHINGLES_CTE},
    hw AS (
      SELECT doc_id,
             ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS w1,
             ('0x' || substr(md5(shingle), 9, 8))::BIGINT AS w2
      FROM sh
    ),
    sig AS (
      SELECT doc_id,
             {_SIG_COLS_SQL}
      FROM hw GROUP BY doc_id
    ),
    bands AS (
      {_bands_sql()}
    )
"""


@register(
    "decontaminate_minhash_fuzzy",
    oracle=f"""
    WITH {_MINHASH_CTES},
    cand AS (
      SELECT DISTINCT t.doc_id AS train_id, e.doc_id AS bench_id
      FROM bands t JOIN bands e
        ON t.band_id = e.band_id AND t.band_key = e.band_key
      WHERE t.doc_id % {_BENCH_MOD} <> 0 AND e.doc_id % {_BENCH_MOD} = 0
    ),
    inter AS (
      SELECT c.train_id, c.bench_id, count(*) AS n_inter
      FROM cand c
      JOIN sh st ON st.doc_id = c.train_id
      JOIN sh se ON se.doc_id = c.bench_id AND se.shingle = st.shingle
      GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id)
    SELECT c.train_id, c.bench_id,
           round(coalesce(i.n_inter, 0) /
                 (zt.n_sh + ze.n_sh - coalesce(i.n_inter, 0)), 6) AS jaccard
    FROM cand c
    LEFT JOIN inter i ON i.train_id = c.train_id AND i.bench_id = c.bench_id
    JOIN sizes zt ON zt.doc_id = c.train_id
    JOIN sizes ze ON ze.doc_id = c.bench_id
    """,
)
def decontaminate_minhash_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUZZY benchmark decontamination: training docs that LSH-collide
    with a held-out eval doc (share any MinHash band), verified with
    exact Jaccard — catches paraphrased/reformatted benchmark leakage
    that exact n-gram decontamination (decontaminate_ngrams) misses.

    Scale: the eval side of the band join is a fixed small slice, so
    the full corpus never self-joins — each training doc's bands probe
    only the benchmark band table (broadcastable at any corpus size;
    left to AQE here since the frame scales with the BENCHMARK, not
    the corpus).

    r13 optimization (guide §2.4): shingles and signatures come from
    the session-shared MinHash chain (plans/shared_subtrees); banding
    is a narrow projection over the tiny cached signature table."""
    from open_tlm_spark.plans.shared_subtrees import (
        shared_shingles,
        shared_signatures,
    )

    sh = shared_shingles(spark, sf_dir)
    bands = D.lsh_bands(shared_signatures(spark, sf_dir))
    is_bench = F.col("doc_id") % _BENCH_MOD == 0
    t = bands.filter(~is_bench).alias("t")
    e = bands.filter(is_bench).alias("e")
    cand = (
        t.join(
            e,
            (F.col("t.band_id") == F.col("e.band_id"))
            & (F.col("t.band_key") == F.col("e.band_key")),
        )
        .select(
            F.col("t.doc_id").alias("doc_a"),
            F.col("e.doc_id").alias("doc_b"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    verified = D.jaccard_for_pairs(cand, sh)
    return cand.join(verified, ["doc_a", "doc_b"], "left").select(
        F.col("doc_a").alias("train_id"),
        F.col("doc_b").alias("bench_id"),
        F.coalesce(F.col("jaccard"), F.lit(0.0)).alias("jaccard"),
    )


# ------------------------------------------------ cross-snapshot diff
@register(
    "corpus_snapshot_diff",
    oracle="""
    WITH a AS (
      SELECT doc_id, source, md5(text) AS fp
      FROM documents WHERE doc_id % 10 < 8
    ),
    b AS (
      SELECT doc_id, source,
             md5(CASE WHEN doc_id % 7 = 0 THEN upper(text) ELSE text END)
               AS fp
      FROM documents WHERE doc_id % 10 >= 2
    ),
    d AS (
      SELECT coalesce(a.source, b.source) AS source,
             CASE WHEN a.doc_id IS NULL THEN 'added'
                  WHEN b.doc_id IS NULL THEN 'removed'
                  WHEN a.fp <> b.fp THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM a FULL JOIN b ON a.doc_id = b.doc_id
    )
    SELECT source, status, count(*) AS n_docs
    FROM d GROUP BY source, status
    """,
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot corpus diff: what entered/left/changed between
    two curation runs, by source. Snapshots are deterministic slices
    of `documents` (A = doc_id%10<8, B = doc_id%10>=2 with docs
    divisible by 7 'edited'); membership + content fingerprints are
    compared with ONE full outer join on doc_id, then counted.

    Scale: fingerprints (16 bytes) shuffle, never the text payload;
    one join keyed on doc_id + one map-side-combinable count."""
    docs = spark.table("documents")
    a = docs.filter(F.col("doc_id") % 10 < 8).select(
        "doc_id", "source", F.md5("text").alias("fp")
    )
    b = docs.filter(F.col("doc_id") % 10 >= 2).select(
        "doc_id",
        "source",
        F.md5(
            F.when(F.col("doc_id") % 7 == 0, F.upper("text")).otherwise(
                F.col("text")
            )
        ).alias("fp"),
    )
    d = a.alias("a").join(
        b.alias("b"), F.col("a.doc_id") == F.col("b.doc_id"), "full"
    )
    status = (
        F.when(F.col("a.doc_id").isNull(), F.lit("added"))
        .when(F.col("b.doc_id").isNull(), F.lit("removed"))
        .when(F.col("a.fp") != F.col("b.fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        d.select(
            F.coalesce(F.col("a.source"), F.col("b.source")).alias("source"),
            status.alias("status"),
        )
        .groupBy("source", "status")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# --------------------------------------- incremental (two-epoch) dedup
@register(
    "dedup_incremental_minhash",
    oracle=f"""
    WITH {_MINHASH_CTES},
    eb AS (
      SELECT doc_id, doc_id % 2 AS epoch, band_id, band_key FROM bands
    ),
    dups AS (
      SELECT d.doc_id, d.epoch,
             min(e.epoch * 1000000000 + e.doc_id) AS first_partner_key
      FROM eb d JOIN eb e
        ON d.band_id = e.band_id AND d.band_key = e.band_key
       AND (e.epoch < d.epoch
            OR (e.epoch = d.epoch AND e.doc_id < d.doc_id))
      GROUP BY d.doc_id, d.epoch
    )
    SELECT doc_id, epoch, first_partner_key FROM dups
    """,
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup detection: docs arrive in two epochs
    (epoch = doc_id % 2, arrival order = (epoch, doc_id)); a doc is
    flagged iff some EARLIER arrival shares a MinHash band with it.
    first_partner_key encodes the earliest such partner as
    epoch*1e9 + doc_id. This is the batch replay that the streaming
    companion (streaming/incremental_dedup.py foreachBatch merge into
    a signature store) must reproduce exactly — same flags, same
    partners, regardless of micro-batch boundaries.

    Scale: the band table is the only shuffled relation (16-byte keys);
    the arrival-order predicate prunes the self-join to forward pairs,
    and per-doc min() collapses before anything leaves the join.
    Signatures come from the session-shared MinHash chain (r13,
    plans/shared_subtrees)."""
    from open_tlm_spark.plans.shared_subtrees import shared_signatures

    bands = D.lsh_bands(shared_signatures(spark, sf_dir)).withColumn(
        "epoch", F.col("doc_id") % 2
    )
    d = bands.alias("d")
    e = bands.alias("e")
    earlier = (F.col("e.epoch") < F.col("d.epoch")) | (
        (F.col("e.epoch") == F.col("d.epoch"))
        & (F.col("e.doc_id") < F.col("d.doc_id"))
    )
    return (
        d.join(
            e,
            (F.col("d.band_id") == F.col("e.band_id"))
            & (F.col("d.band_key") == F.col("e.band_key"))
            & earlier,
        )
        .groupBy(F.col("d.doc_id").alias("doc_id"), F.col("d.epoch").alias("epoch"))
        .agg(
            F.min(
                F.col("e.epoch") * F.lit(1_000_000_000) + F.col("e.doc_id")
            ).alias("first_partner_key")
        )
    )


# ------------------------------------------------- robust MAD outliers
@register(
    "docs_mad_outlier_lengths",
    oracle=f"""
    WITH med AS (
      SELECT source, quantile_cont(n_chars, 0.5) AS med
      FROM documents GROUP BY source
    ),
    dev AS (
      SELECT d.doc_id, d.source, d.n_chars,
             d.n_chars - m.med AS dev
      FROM documents d JOIN med m USING (source)
    ),
    mad AS (
      SELECT source, quantile_cont(abs(dev), 0.5) AS mad
      FROM dev GROUP BY source
    )
    SELECT v.doc_id, v.source, v.n_chars,
           {_HALF_UP6_SQL.format(expr="v.dev / m.mad")} AS robust_z
    FROM dev v JOIN mad m USING (source)
    WHERE m.mad > 0 AND abs(v.dev) / m.mad >= 2
    """,
)
def docs_mad_outlier_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-source length outliers: |x - median| >= 2 MAD.
    Median/MAD instead of mean/stddev because heavy-tailed doc-length
    distributions drag the mean toward the outliers being hunted.

    Floats: medians of integers land on .5 steps, so dev/mad is an
    exact small-denominator rational — 6-dp snapping uses the
    floor-half-up form on both engines (repo float-tie discipline).

    Scale: two grouped exact-percentile aggregates (per source — a
    bounded key set) plus one narrow join; nothing quadratic. At
    100 TB swap quantile_cont for approx_percentile(..., 1e-4) and
    re-audit the flag set."""
    docs = spark.table("documents")
    med = docs.groupBy("source").agg(
        F.expr("percentile(n_chars, 0.5)").alias("med")
    )
    dev = docs.join(med, "source").select(
        "doc_id",
        "source",
        "n_chars",
        (F.col("n_chars") - F.col("med")).alias("dev"),
    )
    mad = dev.groupBy("source").agg(
        F.expr("percentile(abs(dev), 0.5)").alias("mad")
    )
    return (
        dev.join(mad, "source")
        .filter((F.col("mad") > 0) & (F.abs("dev") / F.col("mad") >= 2))
        .select(
            "doc_id",
            "source",
            "n_chars",
            _half_up6(F.col("dev") / F.col("mad")).alias("robust_z"),
        )
    )


# --------------------------------------------------- record linkage
@register(
    "customers_fuzzy_linkage",
    oracle="""
    SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
           a.c_nationkey AS block,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
    FROM customer a
    JOIN customer b
      ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def customers_fuzzy_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution by blocked edit distance: records in the same
    block (nation) whose names are Levenshtein <= 1 apart.

    The oracle STATES the semantics as the within-block quadratic
    join; the Spark plan generates candidates with the DELETION
    NEIGHBORHOOD instead (the indexing trick behind FastSS, Bocek et
    al. 2007, public technique): lev(s, t) <= 1 implies s and t share
    a key in {s} ∪ {s with one char deleted}, so each record emits
    |name|+1 keys, candidates come from ONE equi-join on
    (block, key), and exact levenshtein only verifies the candidate
    set. Linear in records x name length — the within-block
    quadratic never executes (measured 26.9 s -> equi-join cost at
    sf0.1; at 100 TB block width stops mattering entirely).

    levenshtein() is a JVM built-in in Spark and a native function in
    DuckDB — identical distances, no UDF.

    r14 (guide §2.3 "shuffle keys and metadata instead of payloads",
    §8): the candidate join only needs to DECIDE which records pair
    up, so the exploded frame now shuffles an 8-byte xxhash64 of the
    deletion key instead of the variable-length key string, and the
    names stay OUT of the self-join entirely — they are re-attached
    to the (linear) candidate set afterwards by two joins against
    the slim (custkey, name) side, which the planner broadcasts at
    this scale. Hash collisions only ADD candidates (every true
    lev<=1 pair still shares a genuine deletion key, hence the same
    hash) and the exact levenshtein verify drops them — the result
    set is provably unchanged."""
    cust = spark.table("customer").select(
        "c_custkey", "c_nationkey", "c_name"
    )
    dels = F.transform(
        F.sequence(F.lit(1), F.length("c_name")),
        lambda i: F.concat(
            F.col("c_name").substr(F.lit(1), i - 1),
            F.col("c_name").substr(i + 1, F.length("c_name")),
        ),
    )
    keys = cust.select(
        "c_custkey",
        "c_nationkey",
        F.explode(
            F.array_union(F.array(F.col("c_name")), dels)
        ).alias("k"),
    ).select(
        "c_custkey",
        "c_nationkey",
        F.xxhash64("k").alias("hk"),
    )
    a = keys.alias("a")
    b = keys.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.hk") == F.col("b.hk"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .select(
            F.col("a.c_custkey").alias("cust_a"),
            F.col("b.c_custkey").alias("cust_b"),
            F.col("a.c_nationkey").alias("block"),
        )
        .distinct()
    )
    names = cust.select("c_custkey", "c_name")
    na = names.select(
        F.col("c_custkey").alias("cust_a"), F.col("c_name").alias("name_a")
    )
    nb = names.select(
        F.col("c_custkey").alias("cust_b"), F.col("c_name").alias("name_b")
    )
    return (
        cand.join(na, "cust_a")
        .join(nb, "cust_b")
        .withColumn(
            "dist",
            F.levenshtein("name_a", "name_b").cast("long"),
        )
        .filter(F.col("dist") <= 1)
        .select("cust_a", "cust_b", "block", "dist")
    )


# ----------------------------------------------------- skyline operator
# Fixed range-partition fan-out for the two-level skyline sweep: the
# level-2 maxima frame is bounded by this constant, which is what
# makes its broadcast policy-compliant.
_SKYLINE_RANGE_PARTS = 32


@register(
    "parts_skyline_pareto",
    oracle="""
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice
        AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    """,
)
def parts_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): parts not dominated on
    (price low, size high). The oracle states the semantics as a
    quadratic NOT EXISTS; the Spark plan is the O(n log n) sweep —
    collapse to one row per distinct price (max size), running-max
    over price-ascending order, then a part is dominated iff a
    strictly cheaper group reaches its size (prev_cummax >= size) or
    a same-price part strictly exceeds it (gmax > size).

    Scale (VERDICT r7 #2): the running max is a TWO-LEVEL sweep, not a
    global-order window. Distinct prices are range-partitioned into
    _SKYLINE_RANGE_PARTS ranges (range partitioning makes partition id
    monotone in price); level 1 is a per-partition running max (local
    sort, no single-partition exchange); level 2 combines the
    per-partition maxima — a frame bounded by the FIXED partition
    constant — via a broadcast triangular self-join, so the prefix
    maxima never funnel through `Exchange SinglePartition`. Dense
    price domains (millions of distinct prices at 100x) now sort in
    parallel; the only all-to-one data movement is the
    <= _SKYLINE_RANGE_PARTS-row maxima table."""
    part = spark.table("part")
    grp = part.groupBy("p_retailprice").agg(
        F.max("p_size").alias("gmax")
    )
    rng = grp.repartitionByRange(
        _SKYLINE_RANGE_PARTS, "p_retailprice"
    ).withColumn("pid", F.spark_partition_id())
    w_local = (
        Window.partitionBy("pid")
        .orderBy("p_retailprice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rng = rng.withColumn("prev_local", F.max("gmax").over(w_local))
    # level 2: per-partition maxima (<= _SKYLINE_RANGE_PARTS rows, a
    # fixed constant — broadcast is policy-compliant) -> prefix max of
    # every strictly-earlier range via a triangular self-join.
    pmax = rng.groupBy("pid").agg(F.max("gmax").alias("pmax"))
    prefix = (
        pmax.alias("a")
        .join(
            F.broadcast(pmax.alias("b")),
            F.col("b.pid") < F.col("a.pid"),
            "left",
        )
        .groupBy(F.col("a.pid").alias("pid"))
        .agg(F.max(F.col("b.pmax")).alias("prefix_max"))
    )
    swept = rng.join(F.broadcast(prefix), "pid").withColumn(
        "prev_cummax", F.greatest("prev_local", "prefix_max")
    )
    dominated = (
        F.coalesce(
            F.col("prev_cummax") >= F.col("p_size"), F.lit(False)
        )
    ) | (F.col("gmax") > F.col("p_size"))
    return (
        part.join(
            swept.select("p_retailprice", "gmax", "prev_cummax"),
            "p_retailprice",
        )
        .filter(~dominated)
        .select("p_partkey", "p_retailprice", "p_size")
    )


# ------------------------------------------------------- cohort LTV
@register(
    "orders_cohort_ltv",
    oracle=f"""
    WITH first AS (
      SELECT o_custkey, min(o_orderdate) AS d0
      FROM orders GROUP BY o_custkey
    ),
    sized AS (
      SELECT o_custkey,
             year(d0) * 100 + month(d0) AS cohort_month
      FROM first
    ),
    csize AS (
      SELECT cohort_month, count(*) AS n_customers
      FROM sized GROUP BY cohort_month
    ),
    rev AS (
      SELECT year(f.d0) * 100 + month(f.d0) AS cohort_month,
             (year(o.o_orderdate) - year(f.d0)) * 12
               + (month(o.o_orderdate) - month(f.d0)) AS month_index,
             sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders o JOIN first f ON f.o_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT cohort_month, month_index,
             CAST(sum(rev) OVER (
               PARTITION BY cohort_month ORDER BY month_index
             ) AS DOUBLE) AS cum_rev
      FROM rev
    )
    SELECT c.cohort_month, c.month_index, z.n_customers,
           round(c.cum_rev, 2) AS cum_rev,
           {_HALF_UP6_SQL.format(expr="c.cum_rev / z.n_customers")}
             AS ltv_per_customer
    FROM cum c JOIN csize z USING (cohort_month)
    """,
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: customers grouped by first-order
    month; cumulative revenue per customer by months-since-first.
    Month arithmetic is explicit (y*12+m deltas) because engines
    disagree on fractional months_between semantics; money sums are
    DECIMAL(18,2)-exact then divided under the half-up floor.

    Scale: one groupBy per customer (first order), one per
    (cohort, month_index) — both map-side combinable; the running sum
    windows over ~tens of rows per cohort."""
    orders = spark.table("orders")
    first = orders.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("d0")
    )
    cohort = F.year("d0") * 100 + F.month("d0")
    csize = first.select(cohort.alias("cohort_month")).groupBy(
        "cohort_month"
    ).agg(F.count(F.lit(1)).alias("n_customers"))
    rev = (
        orders.join(first, "o_custkey")
        .groupBy(
            cohort.alias("cohort_month"),
            (
                (F.year("o_orderdate") - F.year("d0")) * 12
                + (F.month("o_orderdate") - F.month("d0"))
            ).alias("month_index"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
        )
    )
    w = Window.partitionBy("cohort_month").orderBy("month_index")
    cum = rev.withColumn(
        "cum_rev", F.sum("rev").over(w).cast("double")
    )
    return cum.join(csize, "cohort_month").select(
        "cohort_month",
        "month_index",
        "n_customers",
        F.round("cum_rev", 2).alias("cum_rev"),
        _half_up6(F.col("cum_rev") / F.col("n_customers")).alias(
            "ltv_per_customer"
        ),
    )


# --------------------------------------- equi-depth histogram (CBO stats)
_EQD_BUCKETS = 16
_EQD_FRACS = [k / _EQD_BUCKETS for k in range(1, _EQD_BUCKETS)]


@register(
    "lineitem_equidepth_histogram",
    oracle=f"""
    WITH cuts AS (
      SELECT list_transform(
               quantile_cont(l_extendedprice,
                             {_EQD_FRACS}),
               c -> round(c, 6)
             ) AS qs
      FROM lineitem
    ),
    assigned AS (
      SELECT l.l_extendedprice AS price,
             1 + len(list_filter(c.qs, q -> q < l.l_extendedprice))
               AS bucket_id
      FROM lineitem l, cuts c
    )
    SELECT bucket_id,
           count(*) AS n_rows,
           count(DISTINCT price) AS n_distinct,
           min(price) AS price_min,
           max(price) AS price_max
    FROM assigned GROUP BY bucket_id
    """,
)
def lineitem_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram of l_extendedprice (16 buckets) — the
    statistic a cost-based optimizer's ANALYZE collects for range
    selectivity. Cut points are exact interpolated percentiles,
    snapped to 6 dp in BOTH engines before assignment so a 1-ulp
    interpolation difference can't flip a row across a boundary;
    bucket = 1 + #cuts strictly below the value.

    Scale: cut points come from operators/histogram.exact_quantiles —
    distributed two-phase selection whose reducer state is O(n_bins),
    not O(n): Spark's exact percentile() aggregate ships every
    distinct value into ONE ObjectHashAggregate reducer (measured
    2.0-3.2 s on 600k rows / 583k distinct; the selection path holds
    flat as n grows). The 15-cut array rides a 1-row frame
    cross-joined to the scan (a literal broadcast, not a shuffle).
    At 100 TB, approx_percentile with a tight accuracy knob is also
    acceptable — the histogram is advisory stats, not an answer."""
    from open_tlm_spark.operators.histogram import exact_quantiles

    li = spark.table("lineitem")
    cuts = exact_quantiles(li, "l_extendedprice", _EQD_FRACS).select(
        F.transform("qs", lambda c: F.round(c, 6)).alias("qs")
    )
    assigned = li.crossJoin(cuts).select(
        F.col("l_extendedprice").alias("price"),
        (
            1
            + F.size(
                F.filter("qs", lambda q: q < F.col("l_extendedprice"))
            )
        ).cast("long").alias("bucket_id"),
    )
    return assigned.groupBy("bucket_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("price").alias("n_distinct"),
        F.min("price").alias("price_min"),
        F.max("price").alias("price_max"),
    )


# ------------------------------------------------- event path mining
@register(
    "events_top_paths",
    oracle="""
    WITH s AS (
      SELECT event_type,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type || '>' || e2 || '>' || e3 AS path,
           count(*) AS n_paths
    FROM s WHERE e3 IS NOT NULL
    GROUP BY 1
    ORDER BY n_paths DESC, path
    LIMIT 25
    """,
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential path mining: top-25 3-step event-type paths across
    user sessions (the 3-gram extension of events_markov_transitions'
    2-step matrix). Deterministic: window ordered by (ts, event_id),
    ties in the top-k broken by path string.

    Scale: lead() windows partition by user (high-cardinality key —
    parallel), the path alphabet is tiny (|types|^3), so the count
    aggregate collapses map-side."""
    ev = spark.table("events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        s.filter(F.col("e3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .orderBy(F.col("n_paths").desc(), "path")
        .limit(25)
    )


# ------------------------------------------- time-tolerant event dedup
_DUP_WINDOW_US = 3_600 * 1_000_000  # 1 hour


@register(
    "events_dedup_time_window",
    oracle=f"""
    WITH s AS (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id
             ) AS gap_us
      FROM events
    )
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CASE WHEN gap_us <= {_DUP_WINDOW_US} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dups,
           {_HALF_UP6_SQL.format(
               expr="sum(CASE WHEN gap_us <= " + str(_DUP_WINDOW_US)
               + " THEN 1 ELSE 0 END) * 1.0 / count(*)"
           )} AS dup_rate
    FROM s GROUP BY event_type
    """,
)
def events_dedup_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-tolerant retro dedup: an event is a near-duplicate if the
    same (user, type) fired within the previous hour — the batch
    companion of the streaming dropDuplicates-with-watermark path
    (streaming/ingest.py ST5), run over history where late data has
    already settled.

    Floats: dup counts / totals are exact int ratios -> half-up floor.
    Scale: one lag() window partitioned by (user, type) — no shuffle
    beyond the window's own, counts collapse map-side."""
    ev = spark.table("events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    s = ev.select("event_type", gap.alias("gap_us"))
    is_dup = F.when(
        F.col("gap_us") <= _DUP_WINDOW_US, F.lit(1)
    ).otherwise(F.lit(0))
    return s.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(is_dup).cast("long").alias("n_dups"),
        _half_up6(
            F.sum(is_dup).cast("double") / F.count(F.lit(1))
        ).alias("dup_rate"),
    )
