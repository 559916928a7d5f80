"""Visualization + statistics analytics queries.

Extends the engine's query surface with the standard time-series
analytics a graphing TSDB front-end needs beyond raw rollups
(reference scope: public/graph.js renders from rollup reads; these
push the remaining render-side math into the engine):

  * M4 downsampling (min/max/first/last per pixel bucket) — the
    lossless-for-line-charts downsample (Jugel et al., "M4: A
    Visualization-Oriented Time Series Data Aggregation", VLDB 2014
    — public technique).
  * Global z-score anomaly flagging per series.
  * Pairwise Pearson correlation between series on aligned bins.
  * Deterministic hash split + conversion funnel for the pipeline
    side.

Float-determinism conventions (registry docstring): every mean/std/
correlation is computed from DECIMAL-cast exact sums (order-
independent, identical in Spark and DuckDB), with the identical
double-arithmetic formula applied to those sums on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_tlm_spark.plans.registry import register

# --------------------------------------------------------------- M4
_M4_BUCKET_S = 3600  # one "pixel" per hour


@register(
    "ts_downsample_m4",
    oracle=f"""
    WITH keyed AS (
      SELECT event_type AS dataset_id,
             CAST(floor(epoch_us(ts) / ({_M4_BUCKET_S} * 1000000.0)) AS BIGINT)
               * {_M4_BUCKET_S} AS bucket_ts,
             value,
             printf('%020d%012d', epoch_us(ts), event_id) AS ord
      FROM events
    )
    SELECT dataset_id, bucket_ts,
           min(value) AS min_value,
           max(value) AS max_value,
           arg_min(value, ord) AS first_value,
           arg_max(value, ord) AS last_value,
           count(*) AS n_points
    FROM keyed
    GROUP BY dataset_id, bucket_ts
    """,
)
def ts_downsample_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 visualization downsampling: per (series, time bucket) keep
    min, max, first and last value — the four points that make a
    line-chart render of the bucket pixel-identical to the full data
    (M4, VLDB 2014). ONE hash aggregation with map-side partials; at
    100 TB this is the canonical first-pass render query, shuffling
    four doubles per pixel instead of the raw points.

    First/last ordering key is a zero-padded (epoch_us, event_id)
    string — total order, identical in both engines (min_by/arg_min
    take only scalar keys in DuckDB)."""
    ev = spark.table("events")
    ord_key = F.format_string(
        "%020d%012d", F.unix_micros("ts"), F.col("event_id")
    )
    keyed = ev.select(
        F.col("event_type").alias("dataset_id"),
        (
            F.floor(F.unix_micros("ts") / F.lit(_M4_BUCKET_S * 1_000_000.0))
            .cast("long")
            * _M4_BUCKET_S
        ).alias("bucket_ts"),
        "value",
        ord_key.alias("ord"),
    )
    return keyed.groupBy("dataset_id", "bucket_ts").agg(
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.min_by("value", F.col("ord")).alias("first_value"),
        F.max_by("value", F.col("ord")).alias("last_value"),
        F.count(F.lit(1)).alias("n_points"),
    )


# ----------------------------------------------------------- z-score
@register(
    "ts_anomaly_zscore",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             count(*) AS n,
             sum(CAST(value AS DECIMAL(18,6))) AS s1,
             sum(CAST(CAST(value AS DECIMAL(18,6))
                      * CAST(value AS DECIMAL(18,6)) AS DECIMAL(38,12))) AS s2
      FROM events
      GROUP BY event_type
    ),
    z AS (
      SELECT e.event_id, e.event_type AS dataset_id, e.value,
             round((e.value - CAST(s.s1 AS DOUBLE) / s.n)
                   / sqrt((CAST(s.s2 AS DOUBLE)
                           - CAST(s.s1 AS DOUBLE) * CAST(s.s1 AS DOUBLE) / s.n)
                          / (s.n - 1)), 6) AS zscore
      FROM events e JOIN stats s USING (event_type)
    )
    SELECT event_id, dataset_id, value, zscore
    FROM z WHERE abs(zscore) >= 3.0
    """,
)
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global z-score anomaly flagging: points more than 3 sigma from
    their series mean. Mean/std come from DECIMAL-cast exact sums
    (order-independent across partitions — double summation order
    would differ between engines and runs), then one broadcast join
    of the tiny per-series stats frame back onto the fact scan: two
    narrow passes, one shuffle (the 5-row stats aggregate), scales
    linearly."""
    ev = spark.table("events")
    dec = F.col("value").cast("decimal(18,6)")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).alias("s1"),
        F.sum((dec * dec).cast("decimal(38,12)")).alias("s2"),
    )
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    mean = s1d / F.col("n")
    std = F.sqrt((s2d - s1d * s1d / F.col("n")) / (F.col("n") - 1))
    # stats is one row per series — scales with the catalog; AQE picks
    # the join strategy (broadcast while it fits).
    z = ev.join(stats, "event_type").select(
        "event_id",
        F.col("event_type").alias("dataset_id"),
        "value",
        F.round((F.col("value") - mean) / std, 6).alias("zscore"),
    )
    return z.filter(F.abs(F.col("zscore")) >= 3.0)


# ------------------------------------------------------- correlation
_CORR_BIN_S = 1000


@register(
    "ts_pairwise_corr",
    oracle=f"""
    WITH binned AS (
      SELECT event_type,
             CAST(floor(epoch_us(ts) / ({_CORR_BIN_S} * 1000000.0)) AS BIGINT)
               * {_CORR_BIN_S} AS bin_ts,
             CAST(round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                        / count(*), 6) AS DECIMAL(18,6)) AS v
      FROM events
      GROUP BY event_type, bin_ts
    ),
    paired AS (
      SELECT a.event_type AS series_a, b.event_type AS series_b,
             count(*) AS n_bins,
             sum(a.v) AS sx, sum(b.v) AS sy,
             sum(CAST(a.v * b.v AS DECIMAL(38,12))) AS sxy,
             sum(CAST(a.v * a.v AS DECIMAL(38,12))) AS sxx,
             sum(CAST(b.v * b.v AS DECIMAL(38,12))) AS syy
      FROM binned a JOIN binned b
        ON a.bin_ts = b.bin_ts AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT series_a, series_b, n_bins,
           round((n_bins * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / sqrt((n_bins * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (n_bins * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
             AS pearson_r
    FROM paired
    """,
)
def ts_pairwise_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation between all series, aligned on
    1000-second bins (J2 overlay alignment taken to its analytic
    conclusion). Bin means use DECIMAL exact sums rounded to 6 dp and
    re-cast to DECIMAL, so the pairwise products and their sums are
    exact integers-scaled values in both engines; the final r formula
    runs on those exact sums. Plan: one bin aggregate (shuffle on
    (series, bin)), one equi-join on bin_ts across series pairs, one
    pair aggregate — all map-side-combinable, no window, no
    cartesian (bin join is an equi-join; 5 series -> 10 pairs)."""
    ev = spark.table("events")
    dec = F.col("value").cast("decimal(18,6)")
    binned = (
        ev.groupBy(
            "event_type",
            (
                F.floor(
                    F.unix_micros("ts") / F.lit(_CORR_BIN_S * 1_000_000.0)
                ).cast("long")
                * _CORR_BIN_S
            ).alias("bin_ts"),
        )
        .agg(
            F.round(
                F.sum(dec).cast("double") / F.count(F.lit(1)), 6
            )
            .cast("decimal(18,6)")
            .alias("v")
        )
    )
    a = binned.alias("a")
    b = binned.alias("b")
    paired = (
        a.join(
            b,
            (F.col("a.bin_ts") == F.col("b.bin_ts"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("series_a"),
            F.col("b.event_type").alias("series_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_bins"),
            F.sum("a.v").alias("sx"),
            F.sum("b.v").alias("sy"),
            F.sum((F.col("a.v") * F.col("b.v")).cast("decimal(38,12)")).alias("sxy"),
            F.sum((F.col("a.v") * F.col("a.v")).cast("decimal(38,12)")).alias("sxx"),
            F.sum((F.col("b.v") * F.col("b.v")).cast("decimal(38,12)")).alias("syy"),
        )
    )
    n = F.col("n_bins")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    return paired.select(
        "series_a",
        "series_b",
        "n_bins",
        F.round(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("pearson_r"),
    )


# ------------------------------------------------------- hash split
@register(
    "stratified_split",
    oracle="""
    WITH assigned AS (
      SELECT source,
             CASE
               WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                    % 100 < 80 THEN 'train'
               WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                    % 100 < 90 THEN 'val'
               ELSE 'test'
             END AS split,
             n_chars
      FROM documents
    )
    SELECT source, split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM assigned
    GROUP BY source, split
    """,
)
def stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (80/10/10) by hashing the
    document id — the reproducible, coordination-free split every
    training pipeline needs: no sampling state, no shuffle to assign
    (pure narrow projection), any worker can recompute any doc's
    split. Output audits the per-source composition, the check that
    stratification didn't skew a domain. (Oracle CASTs sum() to
    BIGINT — DuckDB integer sums yield HUGEINT.)"""
    docs = spark.table("documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        docs.select("source", split.alias("split"), "n_chars")
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


# ----------------------------------------------------------- funnel
@register(
    "event_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS v_ts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS c_ts
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts >= v.v_ts
      WHERE e.event_type = 'click'
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS p_ts
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts >= c.c_ts
      WHERE e.event_type = 'purchase'
      GROUP BY e.user_id
    )
    SELECT count(*) AS n_view,
           count(c.c_ts) AS n_click,
           count(p.p_ts) AS n_purchase,
           round(count(c.c_ts) / CAST(count(*) AS DOUBLE), 6) AS view_to_click,
           round(count(p.p_ts) / CAST(count(c.c_ts) AS DOUBLE), 6)
             AS click_to_purchase
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase: per user,
    the first click at-or-after the first view, then the first
    purchase at-or-after that click; output stage counts and
    conversion rates. Each stage is one groupBy(user_id) aggregate
    joined on user_id — after the first stage's shuffle the join keys
    are co-partitioned, so Catalyst reuses the exchange instead of
    re-shuffling; no window functions, no range join (the time
    predicate piggybacks on the user_id equi-join)."""
    ev = spark.table("events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    joined = v.join(c, "user_id", "left").join(p, "user_id", "left")
    return joined.agg(
        F.count(F.lit(1)).alias("n_view"),
        F.count("c_ts").alias("n_click"),
        F.count("p_ts").alias("n_purchase"),
        F.round(F.count("c_ts") / F.count(F.lit(1)).cast("double"), 6).alias(
            "view_to_click"
        ),
        F.round(F.count("p_ts") / F.count("c_ts").cast("double"), 6).alias(
            "click_to_purchase"
        ),
    )


# ------------------------------------------------- BPE pair counts
@register(
    "bpe_pair_counts",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         t -> t <> '') AS w
      FROM documents
    ),
    pairs AS (
      SELECT w[i+1] || ' ' || w[i+2] AS pair
      FROM toks, UNNEST(range(0, len(w) - 1)) AS u(i)
      WHERE len(w) >= 2
    )
    SELECT pair, count(*) AS n_occurrences
    FROM pairs GROUP BY pair
    ORDER BY n_occurrences DESC, pair LIMIT 50
    """,
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The counting step of one BPE-training iteration: frequency of
    every ADJACENT token pair (with multiplicity) across the corpus,
    top-50 by count with the pair as tiebreak. One explode + one
    hash aggregate with map-side partials, then TakeOrderedAndProject
    — at corpus scale the shuffle carries one row per distinct pair
    per partition, never the corpus. Reuses text.bigrams (the
    NON-distinct 2-grams repetition scoring uses). r13 (guide §2.4):
    the pair-count table is the session-shared bigram frame the
    bigram-LM scorer and the PMI collocations also aggregate — one
    explode+aggregate per session, three consumers."""
    from open_tlm_spark.plans.shared_subtrees import shared_bigram_counts

    return (
        shared_bigram_counts(spark, sf_dir)
        .select("pair", F.col("c").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "pair")
        .limit(50)
    )


# ----------------------------------------- seasonal-naive residual
_SEASON_BIN_S = 3600
_SEASON_LAG_S = 86400


@register(
    "ts_seasonal_residual",
    oracle=f"""
    WITH binned AS (
      SELECT event_type AS dataset_id,
             CAST(floor(epoch_us(ts) / ({_SEASON_BIN_S} * 1000000.0)) AS BIGINT)
               * {_SEASON_BIN_S} AS bin_ts,
             CAST(round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                        / count(*), 6) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    )
    SELECT a.dataset_id, a.bin_ts, a.v, b.v AS v_prev_day,
           round(a.v - b.v, 6) AS residual
    FROM binned a JOIN binned b
      ON a.dataset_id = b.dataset_id
     AND b.bin_ts = a.bin_ts - {_SEASON_LAG_S}
    """,
)
def ts_seasonal_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive residual: each series' hourly mean minus its
    value 24h earlier — the standard first-cut seasonality check (and
    the baseline any forecast must beat). Bin means from DECIMAL
    exact sums; the day-lag lookup is a self equi-join on
    (series, shifted bin) — both sides shuffle-partitioned the same
    way, no window sort, no range join."""
    ev = spark.table("events")
    dec = F.col("value").cast("decimal(18,6)")
    binned = (
        ev.groupBy(
            F.col("event_type").alias("dataset_id"),
            (
                F.floor(
                    F.unix_micros("ts") / F.lit(_SEASON_BIN_S * 1_000_000.0)
                ).cast("long")
                * _SEASON_BIN_S
            ).alias("bin_ts"),
        )
        .agg(
            F.round(F.sum(dec).cast("double") / F.count(F.lit(1)), 6)
            .cast("double")
            .alias("v")
        )
    )
    a = binned.alias("a")
    b = binned.alias("b")
    return a.join(
        b,
        (F.col("a.dataset_id") == F.col("b.dataset_id"))
        & (F.col("b.bin_ts") == F.col("a.bin_ts") - _SEASON_LAG_S),
    ).select(
        F.col("a.dataset_id").alias("dataset_id"),
        F.col("a.bin_ts").alias("bin_ts"),
        F.col("a.v").alias("v"),
        F.col("b.v").alias("v_prev_day"),
        F.round(F.col("a.v") - F.col("b.v"), 6).alias("residual"),
    )


# --------------------------------------------- unigram LM quality
@register(
    "quality_unigram_logprob",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         t -> t <> '') AS w
      FROM documents
    ),
    tok AS (SELECT doc_id, unnest(w) AS token FROM toks),
    freq AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
    total AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM freq),
    scored AS (
      SELECT t.doc_id,
             round(ln(CAST(f.c AS DOUBLE) / total.n), 6) AS logp
      FROM tok t JOIN freq f USING (token), total
    )
    SELECT doc_id,
           count(*) AS n_tokens,
           CAST(round(sum(CAST(logp AS DECIMAL(18,6))), 6) AS DOUBLE)
             AS sum_logp,
           round(CAST(sum(CAST(logp AS DECIMAL(18,6))) AS DOUBLE)
                 / count(*), 6) AS avg_logp
    FROM scored GROUP BY doc_id
    """,
)
def quality_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM document scoring — the perplexity-proxy quality
    filter: per doc, the sum/mean log-probability of its tokens under
    the corpus unigram distribution (gibberish and boilerplate sit in
    the tails). Two passes: token frequencies (one aggregate), then a
    probe join back onto the token stream. The frequency table is
    Zipf-bounded (|vocab| << corpus) -> broadcast; per-token logp is
    rounded to 6 dp and summed as DECIMAL so the per-doc aggregate is
    order-independent and engine-identical."""
    from open_tlm_spark.plans.shared_subtrees import (
        shared_unigram_counts,
        token_stream,
    )

    # r13 (guide §2.4): token stream + unigram LM table come from the
    # session-shared tokenized corpus (ccnet buckets share both).
    tok = token_stream(spark, sf_dir).select("doc_id", "token")
    # freq is vocab-sized (scales with the corpus) — no broadcast
    # hint; AQE broadcasts while it fits and otherwise reuses freq's
    # own token-keyed exchange for a shuffle join. total is 1 row.
    freq = shared_unigram_counts(spark, sf_dir)
    total = freq.agg(F.sum("c").cast("long").alias("n"))
    scored = (
        tok.join(freq, "token")
        .join(F.broadcast(total))
        .select(
            "doc_id",
            F.round(F.log(F.col("c").cast("double") / F.col("n")), 6).alias(
                "logp"
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.sum(F.col("logp").cast("decimal(18,6)")), 6)
        .cast("double")
        .alias("sum_logp"),
        F.round(
            F.sum(F.col("logp").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_logp"),
    )


# ------------------------------------------------- counter rate
_RATE_BIN_S = 3600


@register(
    "ts_counter_rate",
    oracle=f"""
    WITH d AS (
      SELECT event_type AS dataset_id, ts,
             CAST(value AS DECIMAL(18,6)) AS v,
             lag(CAST(value AS DECIMAL(18,6))) OVER (
                 PARTITION BY event_type ORDER BY ts, event_id) AS pv
      FROM events
    ),
    inc AS (
      SELECT dataset_id,
             CAST(floor(epoch_us(ts) / ({_RATE_BIN_S} * 1000000.0)) AS BIGINT)
               * {_RATE_BIN_S} AS bucket_ts,
             CASE WHEN pv IS NULL THEN NULL
                  WHEN v >= pv THEN v - pv
                  ELSE v END AS step
      FROM d
    )
    SELECT dataset_id, bucket_ts,
           count(step) AS n_steps,
           round(CAST(sum(step) AS DOUBLE) / {_RATE_BIN_S}, 6) AS rate_per_s
    FROM inc WHERE step IS NOT NULL
    GROUP BY dataset_id, bucket_ts
    """,
)
def ts_counter_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counter-reset-aware rate (the Prometheus `rate()` semantic):
    per-point increase = v - lag(v), except a decrease means the
    counter reset and the increase is v itself; hourly rate = summed
    increases / window seconds. One window (lag per series, event_id
    tiebreak for equal timestamps) + one hash aggregate. All deltas
    stay in DECIMAL so the per-bucket sum is order-independent and
    engine-identical; only the final /3600 is double. At scale the lag
    window partitions by series — no global sort — and the aggregate
    is map-side combinable."""
    from pyspark.sql import Window

    ev = spark.table("events")
    v = F.col("value").cast("decimal(18,6)")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    d = ev.select(
        F.col("event_type").alias("dataset_id"),
        "ts",
        v.alias("v"),
        F.lag(v).over(w).alias("pv"),
    )
    step = (
        F.when(F.col("pv").isNull(), F.lit(None).cast("decimal(18,6)"))
        .when(F.col("v") >= F.col("pv"), F.col("v") - F.col("pv"))
        .otherwise(F.col("v"))
    )
    inc = d.select(
        "dataset_id",
        (
            F.floor(F.unix_micros("ts") / F.lit(_RATE_BIN_S * 1_000_000.0))
            .cast("long")
            * _RATE_BIN_S
        ).alias("bucket_ts"),
        step.alias("step"),
    ).filter(F.col("step").isNotNull())
    return inc.groupBy("dataset_id", "bucket_ts").agg(
        F.count("step").alias("n_steps"),
        F.round(F.sum("step").cast("double") / _RATE_BIN_S, 6).alias(
            "rate_per_s"
        ),
    )


# ------------------------------------------------- time-weighted avg
@register(
    "ts_time_weighted_avg",
    oracle="""
    WITH d AS (
      SELECT event_type AS dataset_id,
             CAST(value AS DECIMAL(18,6)) AS v,
             epoch_us(ts) AS t_us,
             lead(epoch_us(ts)) OVER (
                 PARTITION BY event_type ORDER BY ts, event_id) AS next_us
      FROM events
    )
    SELECT dataset_id,
           count(*) AS n_segments,
           round(CAST(sum(v * (next_us - t_us)) AS DOUBLE)
                 / CAST(sum(next_us - t_us) AS BIGINT), 6) AS twa
    FROM d WHERE next_us IS NOT NULL
    GROUP BY dataset_id
    """,
)
def ts_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per series: each point holds its value
    until the next point (zero-order hold), so the mean weights each
    value by its holding duration — the correct average for unevenly
    sampled series (a plain mean over-weights bursts). Weights are
    exact integer microseconds from lead(); value×duration products
    are DECIMAL-exact, so the aggregate is order-independent; one
    per-series window + one aggregate, no data-dependent branching."""
    from pyspark.sql import Window

    ev = spark.table("events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    d = ev.select(
        F.col("event_type").alias("dataset_id"),
        F.col("value").cast("decimal(18,6)").alias("v"),
        F.unix_micros("ts").alias("t_us"),
        F.lead(F.unix_micros("ts")).over(w).alias("next_us"),
    ).filter(F.col("next_us").isNotNull())
    dur = F.col("next_us") - F.col("t_us")
    return d.groupBy("dataset_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.round(
            F.sum(F.col("v") * dur).cast("double")
            / F.sum(dur).cast("long"),
            6,
        ).alias("twa"),
    )


# ------------------------------------------------- 2-D heatmap
_HEAT_BIN_S = 3600
_HEAT_VBUCKETS = 10


@register(
    "ts_heatmap_2d",
    oracle=f"""
    WITH stats AS (
      SELECT event_type, min(value) AS vmin, max(value) AS vmax
      FROM events GROUP BY event_type
    )
    SELECT e.event_type AS dataset_id,
           CAST(floor(epoch_us(e.ts) / ({_HEAT_BIN_S} * 1000000.0)) AS BIGINT)
             * {_HEAT_BIN_S} AS bucket_ts,
           least({_HEAT_VBUCKETS} - 1,
                 CAST(floor((e.value - s.vmin) / (s.vmax - s.vmin)
                            * {_HEAT_VBUCKETS}) AS BIGINT)) AS vbucket,
           count(*) AS n_points
    FROM events e JOIN stats s ON e.event_type = s.event_type
    GROUP BY 1, 2, 3
    """,
)
def ts_heatmap_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density heatmap: counts per (series, hour bucket, value decile)
    — the 2-D render behind distribution-over-time charts (the
    engine-side generalization of the reference's 1-D histogram,
    public/histogram.js). Per-series min/max come from one tiny
    aggregate broadcast back onto the scan; the bucket expression is a
    single double formula evaluated identically in both engines; then
    ONE count aggregate. Two narrow passes over the fact table, one
    broadcast, one shuffle."""
    ev = spark.table("events")
    stats = ev.groupBy("event_type").agg(
        F.min("value").alias("vmin"), F.max("value").alias("vmax")
    )
    vbucket = F.least(
        F.lit(_HEAT_VBUCKETS - 1),
        F.floor(
            (F.col("value") - F.col("vmin"))
            / (F.col("vmax") - F.col("vmin"))
            * _HEAT_VBUCKETS
        ).cast("long"),
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy(
            F.col("event_type").alias("dataset_id"),
            (
                F.floor(
                    F.unix_micros("ts") / F.lit(_HEAT_BIN_S * 1_000_000.0)
                ).cast("long")
                * _HEAT_BIN_S
            ).alias("bucket_ts"),
            vbucket.alias("vbucket"),
        )
        .agg(F.count(F.lit(1)).alias("n_points"))
    )


# ------------------------------------------------- Markov transitions
@register(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS from_type,
             lead(event_type) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      FROM events
    ),
    c AS (
      SELECT from_type, to_type, count(*) AS n
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           round(n / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE), 6)
             AS p
    FROM c
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current event type) — the
    sequence-model statistic behind next-action prediction and funnel
    anomaly detection. One lead() window per user (event_id tiebreak),
    one aggregate, then a window normalization over the tiny
    |types|² matrix. Counts are exact integers, the only double is the
    final ratio — engine-identical."""
    from pyspark.sql import Window

    ev = spark.table("events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    c = seq.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    wn = Window.partitionBy("from_type")
    return c.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wn).cast("double"), 6).alias(
            "p"
        ),
    )


# ------------------------------------------------- activity entropy
@register(
    "user_activity_entropy",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, count(*) AS c
      FROM events GROUP BY user_id, event_type
    ),
    t AS (
      SELECT user_id, event_type, c,
             CAST(sum(c) OVER (PARTITION BY user_id) AS BIGINT) AS n
      FROM c
    )
    SELECT user_id,
           max(n) AS n_events,
           count(*) AS n_types,
           round(-CAST(sum(CAST(round((c / CAST(n AS DOUBLE))
                 * ln(c / CAST(n AS DOUBLE)), 6) AS DECIMAL(18,6)))
                 AS DOUBLE), 6) AS entropy
    FROM t GROUP BY user_id
    """,
)
def user_activity_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Shannon entropy of the event-type distribution — the
    behavioral-diversity score (bots and single-purpose scripts sit
    near zero; exploratory users near ln(|types|)). One aggregate for
    per-(user, type) counts, a window sum for the per-user total on
    the already-reduced frame, then the entropy aggregate. Each
    p·ln(p) term is rounded to 6 dp and DECIMAL-summed, so the
    per-user sum is order-independent and engine-identical."""
    from pyspark.sql import Window

    ev = spark.table("events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    wn = Window.partitionBy("user_id")
    t = c.select(
        "user_id", "c", F.sum("c").over(wn).cast("long").alias("n")
    )
    p = F.col("c") / F.col("n").cast("double")
    term = F.round(p * F.log(p), 6).cast("decimal(18,6)")
    return t.groupBy("user_id").agg(
        F.max("n").alias("n_events"),
        F.count(F.lit(1)).alias("n_types"),
        F.round(-F.sum(term).cast("double"), 6).alias("entropy"),
    )


# ------------------------------------------------- Holt linear trend
_HOLT_A = 0.5  # alpha: level smoothing
_HOLT_B = 0.3  # beta: trend smoothing


@register(
    "ts_holt_linear",
    # Two-state recurrence folded per row over the series prefix:
    # acc = [level, trend], seeded by the first element's [x1, 0.0]
    # (list_reduce uses element 1 as init — list_transform wraps every
    # x as [x, 0.0] so the seed is exactly [x1, 0]). The level
    # expression is inlined twice in the trend term; both evaluate
    # identically, matching the kernel's single-assignment order.
    oracle=f"""
    WITH s AS (
      SELECT event_type AS dataset_id,
             list(event_id ORDER BY ts, event_id) AS ids,
             list(ts ORDER BY ts, event_id) AS tss,
             list(value ORDER BY ts, event_id) AS vals
      FROM events GROUP BY 1
    ),
    u AS (
      SELECT dataset_id,
             unnest(ids) AS event_id,
             unnest(tss) AS ts,
             unnest(vals) AS value,
             unnest(range(1, len(vals) + 1)) AS i,
             vals
      FROM s
    ),
    f AS (
      SELECT dataset_id, event_id, ts, value,
             list_reduce(
               list_transform(vals[1:i], v -> [v, 0.0]),
               (acc, x) -> [
                 {_HOLT_A} * x[1] + {1.0 - _HOLT_A} * (acc[1] + acc[2]),
                 {_HOLT_B} * (({_HOLT_A} * x[1]
                               + {1.0 - _HOLT_A} * (acc[1] + acc[2]))
                              - acc[1]) + {1.0 - _HOLT_B} * acc[2]
               ]) AS st
      FROM u
    )
    SELECT dataset_id, event_id, ts, value,
           round(st[1], 6) AS level, round(st[2], 6) AS trend
    FROM f
    """,
)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing (level + trend) per series —
    the forecasting-grade successor to EWMA: the trend state makes the
    smoother track ramps without lag, and level+trend extrapolates a
    one-step forecast. Inherently sequential (two-state recurrence),
    so it runs as an Arrow-batched grouped-map kernel: ONE shuffle on
    the series key, per-series state never crosses partitions
    (operators/timeseries.holt_linear). The oracle re-derives the
    recurrence as a per-row prefix fold — O(n^2) oracle-only cost."""
    from open_tlm_spark.operators.timeseries import holt_linear

    pts = spark.table("events").select(
        F.col("event_type").alias("dataset_id"), "event_id", "ts", "value"
    )
    out = holt_linear(pts, _HOLT_A, _HOLT_B)
    return out.select(
        "dataset_id",
        "event_id",
        "ts",
        "value",
        F.round("level", 6).alias("level"),
        F.round("trend", 6).alias("trend"),
    )


# ------------------------------------------------- MAD robust outliers
@register(
    "ts_anomaly_mad",
    oracle="""
    WITH med AS (
      SELECT event_type AS dataset_id,
             round(quantile_cont(value, 0.5), 6) AS median
      FROM events GROUP BY 1
    ),
    dev AS (
      SELECT m.dataset_id, e.value, m.median,
             abs(e.value - m.median) AS ad
      FROM events e JOIN med m ON m.dataset_id = e.event_type
    ),
    mad AS (
      SELECT dataset_id,
             round(quantile_cont(ad, 0.5), 6) AS mad
      FROM dev GROUP BY 1
    )
    SELECT d.dataset_id,
           CAST(count(*) AS BIGINT) AS n,
           max(d.median) AS median,
           max(m.mad) AS mad,
           CAST(count(*) FILTER (WHERE
             abs(round(0.6745 * (d.value - d.median) / m.mad, 6)) > 3.5)
             AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (dataset_id)
    GROUP BY 1
    """,
)
def ts_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via the modified z-score (Iglewicz &
    Hoaglin, 'How to Detect and Handle Outliers', 1993 — public
    technique): median + median-absolute-deviation replace mean/std,
    so the detector's own baseline is immune to the outliers it
    hunts (ts_anomaly_zscore's known failure mode under heavy tails).
    Two grouped exact percentiles (Spark `percentile` == DuckDB
    quantile_cont) with the tiny per-series stats broadcast back;
    flags are counted on the 6-dp-rounded score so the |z| > 3.5
    boundary is engine-identical. At 100 TB swap approx_percentile
    into the identical plan (the sketch note on
    percentiles_by_event_type applies)."""
    ev = spark.table("events").select(
        F.col("event_type").alias("dataset_id"), "value"
    )
    med = ev.groupBy("dataset_id").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("median")
    )
    # med/mad are one row per series — no broadcast hints (AQE decides).
    dev = ev.join(med, "dataset_id").select(
        "dataset_id",
        "value",
        "median",
        F.abs(F.col("value") - F.col("median")).alias("ad"),
    )
    mad = dev.groupBy("dataset_id").agg(
        F.round(F.expr("percentile(ad, 0.5)"), 6).alias("mad")
    )
    mz = F.round(
        F.lit(0.6745) * (F.col("value") - F.col("median")) / F.col("mad"), 6
    )
    return (
        dev.join(mad, "dataset_id")
        .groupBy("dataset_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("median").alias("median"),
            F.max("mad").alias("mad"),
            F.count(F.when(F.abs(mz) > 3.5, 1)).alias("n_outliers"),
        )
    )


# ------------------------------------------- time-bounded funnel
_FUNNEL_WINDOW_S = 3600


@register(
    "event_funnel_windowed",
    oracle=f"""
    WITH v AS (
      SELECT user_id, min(ts) AS v_ts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS c_ts
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts >= v.v_ts
      WHERE e.event_type = 'click'
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS p_ts, min(c.c_ts) AS c_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
        AND epoch_us(e.ts) - epoch_us(c.c_ts)
            <= {_FUNNEL_WINDOW_S}::BIGINT * 1000000
      GROUP BY e.user_id
    )
    SELECT count(*) AS n_click_users,
           count(p.p_ts) AS n_converted,
           round(count(p.p_ts) / CAST(count(*) AS DOUBLE), 6)
             AS conv_rate,
           round(CAST(sum(epoch_us(p.p_ts) - epoch_us(p.c_ts)) AS DOUBLE)
                 / count(p.p_ts) / 1000000.0, 6) AS avg_delay_s
    FROM c LEFT JOIN p ON c.user_id = p.user_id
    """,
)
def event_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded conversion funnel: of the users who clicked (first
    click at-or-after first view, the event_funnel semantics), how
    many purchased WITHIN {_FUNNEL_WINDOW_S} s of that click, and the
    mean click-to-purchase delay among converters — attribution
    windows are how production funnels are actually scored (an
    unbounded funnel credits purchases made weeks later).

    Plan: the range predicate piggybacks on the user_id equi-join
    (per-user event counts are bounded), so no interval machinery is
    needed — each stage stays a groupBy(user_id) aggregate on
    co-partitioned exchanges, and the delay average is an exact
    integer-microsecond sum divided at the end, identically
    associated in both engines."""
    ev = spark.table("events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") >= F.col("c_ts"))
            & (
                F.unix_micros("ts") - F.unix_micros("c_ts")
                <= F.lit(_FUNNEL_WINDOW_S * 1_000_000)
            )
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"), F.min("c_ts").alias("pc_ts"))
    )
    joined = c.join(p, "user_id", "left")
    delay_us = F.unix_micros("p_ts") - F.unix_micros("pc_ts")
    return joined.agg(
        F.count(F.lit(1)).alias("n_click_users"),
        F.count("p_ts").alias("n_converted"),
        F.round(
            F.count("p_ts") / F.count(F.lit(1)).cast("double"), 6
        ).alias("conv_rate"),
        F.round(
            F.sum(delay_us).cast("double")
            / F.count("p_ts")
            / F.lit(1_000_000.0),
            6,
        ).alias("avg_delay_s"),
    )
