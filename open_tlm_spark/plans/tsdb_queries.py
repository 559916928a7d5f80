"""TSDB operator inventory as driver-checkable queries (SURVEY.md §2).

The driver's ``events`` table plays the reference's points model:
dataset_id = event_type, ts, value (see sources.points). Each query
cites the reference operator(s) it subsumes.

Oracle conventions: bin timestamps as epoch-second BIGINT via exact
integer arithmetic; means rounded to 6 dp on both sides; top-k with a
unique tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_tlm_spark.functions.time import floor_to
from open_tlm_spark.operators.histogram import histogram, range_summary
from open_tlm_spark.operators.rollup import (
    aggregate_points,
    cascade_from_finer,
    recommended_fidelity,
    with_mean,
)
from open_tlm_spark.plans.registry import register
from open_tlm_spark.sources.points import events_as_points

# Query window constants (events span 2024-01-01 .. 2024-01-30).
T0 = "2024-01-05 00:00:00"
T1 = "2024-01-15 00:00:00"


def _points(spark: SparkSession) -> DataFrame:
    return events_as_points(spark.table("events"))


def _round6(c) -> F.Column:
    return F.round(c, 6)


# --------------------------------------------------------------- S1/P1/P2
@register(
    "ts_range_scan",
    oracle=f"""
    SELECT event_type AS dataset_id, ts, value
    FROM events
    WHERE event_type = 'purchase'
      AND ts BETWEEN TIMESTAMP '{T0}' AND TIMESTAMP '{T1}'
    """,
)
def ts_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 time-range scan + P2 dataset-id equality, exact range
    semantics (reference is file-granular: src/index.py:204-217).

    Plan: parquet scan with both predicates pushed
    (PushedFilters: [ts >= .., ts <= .., event_type = ..]), 3-column
    ReadSchema — no shuffle at all.
    """
    return _points(spark).filter(
        (F.col("dataset_id") == "purchase")
        & F.col("ts").between(F.lit(T0).cast("timestamp"), F.lit(T1).cast("timestamp"))
    )


# ------------------------------------------------------------------ A1/A4
def _agg_oracle(duration: int, source_filter: str = "") -> str:
    return f"""
    SELECT event_type AS dataset_id,
           (epoch_us(ts) // ({duration}::BIGINT * 1000000)) * {duration} AS bin_ts,
           min(value) AS min_value,
           max(value) AS max_value,
           round(sum(value), 6) AS sum_values,
           count(value) AS count,
           round(sum(value) / count(value), 6) AS mean_value
    FROM events {source_filter}
    GROUP BY 1, 2
    """


@register("ts_agg_1000s", oracle=_agg_oracle(1000))
def ts_agg_1000s(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 tumbling-window aggregate at the 1000 s fidelity + A4 mean
    derivation. One hash-agg shuffle keyed (dataset_id, bin) with
    map-side partial aggregation — input order irrelevant (the
    reference pre-sorts; hash agg doesn't need it)."""
    agg = with_mean(aggregate_points(_points(spark), 1000))
    return agg.select(
        "dataset_id",
        "bin_ts",
        "min_value",
        "max_value",
        _round6("sum_values").alias("sum_values"),
        "count",
        _round6("mean_value").alias("mean_value"),
    )


# --------------------------------------------------------------------- A3
@register(
    "ts_rollup_cascade",
    oracle=f"""
    SELECT event_type AS dataset_id,
           (epoch_us(ts) // (100000::BIGINT * 1000000)) * 100000 AS bin_ts,
           min(value) AS min_value,
           max(value) AS max_value,
           round(sum(value), 6) AS sum_values,
           count(value) AS count
    FROM events
    GROUP BY 1, 2
    """,
)
def ts_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 multi-resolution rollup cascade: the 100000 s level built by
    re-aggregating 1000 s -> 10000 s -> 100000 s (algebraic
    composition). The oracle aggregates raw directly — equality IS the
    rollup-composability law (SURVEY.md §5 property 3).

    At 100 TB this is the whole point: each cascade step reads ~10x
    less than raw, so maintaining all 6 levels costs ~1.1 passes over
    the finest rollup instead of 6 passes over raw.
    """
    level = aggregate_points(_points(spark), 1000)
    for d in (10_000, 100_000):
        level = cascade_from_finer(level, d)
    return level.select(
        "dataset_id",
        "bin_ts",
        "min_value",
        "max_value",
        _round6("sum_values").alias("sum_values"),
        "count",
    )


# --------------------------------------------------------------------- O2
@register("ts_fidelity_route", oracle=_agg_oracle(
    1000,
    f"WHERE ts BETWEEN TIMESTAMP '{T0}' AND TIMESTAMP '{T1}'",
))
def ts_fidelity_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 rollup routing: a 10-day range (864000 s) routes to the
    1000 s level per the reference thresholds (src/index.py:252-275)
    — asserted here, then answered from that level."""
    duration = 10 * 86400
    assert recommended_fidelity(duration) == 1000
    pts = _points(spark).filter(
        F.col("ts").between(F.lit(T0).cast("timestamp"), F.lit(T1).cast("timestamp"))
    )
    agg = with_mean(aggregate_points(pts, 1000))
    return agg.select(
        "dataset_id",
        "bin_ts",
        "min_value",
        "max_value",
        _round6("sum_values").alias("sum_values"),
        "count",
        _round6("mean_value").alias("mean_value"),
    )


# ------------------------------------------------------------------ A6/A7
@register(
    "ts_histogram",
    oracle="""
    WITH stats AS (
      SELECT min(value) AS lo, max(value) AS hi,
             count(DISTINCT value) AS n_distinct
      FROM events
    ),
    b AS (
      SELECT CASE WHEN s.hi = s.lo THEN 0
                  ELSE least(
                    CAST(floor((e.value - s.lo) /
                         ((s.hi - s.lo) / least(s.n_distinct, 30))) AS BIGINT),
                    least(s.n_distinct, 30) - 1)
             END AS bucket
      FROM events e, stats s
    )
    SELECT bucket, count(*) AS n FROM b GROUP BY bucket
    """,
)
def ts_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 equal-width histogram + A7 exact distinct bucket rule
    (public/histogram.js:58-132), server-side. Two aggregations, no
    UDFs; the 1-row stats frame is broadcast."""
    return histogram(_points(spark), "value", max_buckets=30)


# --------------------------------------------------------------------- A8
@register(
    "ts_minmax_range",
    oracle=f"""
    SELECT event_type AS dataset_id,
           min(value) AS min_value,
           max(value) AS max_value,
           round(avg(value), 6) AS mean_value,
           count(*) AS count
    FROM events
    WHERE ts BETWEEN TIMESTAMP '{T0}' AND TIMESTAMP '{T1}'
    GROUP BY 1
    """,
)
def ts_minmax_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 visible-range min/max/mean per series (axis autoscaling,
    public/axes.js:118-164)."""
    pts = _points(spark).filter(
        F.col("ts").between(F.lit(T0).cast("timestamp"), F.lit(T1).cast("timestamp"))
    )
    out = range_summary(pts)
    return out.select(
        "dataset_id",
        "min_value",
        "max_value",
        _round6("mean_value").alias("mean_value"),
        "count",
    )


# ------------------------------------------------------------ P3/C1/T3
@register(
    "ts_dataset_search",
    oracle="""
    SELECT DISTINCT event_type AS dataset_id
    FROM events
    WHERE event_type LIKE '%u%'
    ORDER BY dataset_id
    LIMIT 300
    """,
)
def ts_dataset_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 substring search over the dataset catalog (C1), limit AFTER
    the filter (the reference caps scanned entries before filtering —
    quirk fixed, SURVEY.md §4)."""
    return (
        _points(spark)
        .select("dataset_id")
        .distinct()
        .filter(F.col("dataset_id").contains("u"))
        .orderBy("dataset_id")
        .limit(300)
    )


# ------------------------------------------------------------------ T4/O9
@register(
    "ts_topk_latest",
    oracle="""
    SELECT event_type AS dataset_id, ts, value
    FROM events
    WHERE event_type = 'error'
    ORDER BY ts DESC, event_id DESC
    LIMIT 20
    """,
)
def ts_topk_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 ordered limit -> Spark plans TakeOrderedAndProject (top-k,
    the reference's early-exit O9) — no global sort."""
    ev = spark.table("events").filter(F.col("event_type") == "error")
    return (
        ev.orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(20)
        .select(F.col("event_type").alias("dataset_id"), "ts", "value")
    )


# --------------------------------------------------------------- P4/C3/T4
@register(
    "ts_comment_tag_filter",
    oracle=f"""
    WITH comments AS (
      SELECT event_id AS id, ts, props AS text,
             [event_type, CASE WHEN value >= 100 THEN 'high' ELSE 'low' END] AS tags
      FROM events
    )
    SELECT id, ts, text
    FROM comments
    WHERE ts BETWEEN TIMESTAMP '{T0}' AND TIMESTAMP '{T1}'
      AND len(list_intersect(tags, ['error', 'high'])) = 2
    ORDER BY ts, id
    LIMIT 20
    """,
)
def ts_comment_tag_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 comment range + all-tags-present filter with T4's ordered
    cap (Marks.get, src/marks.py:34-63). Tags as a real ArrayType;
    all-present = size(array_intersect(tags, query)) == |query|."""
    ev = spark.table("events")
    comments = ev.select(
        F.col("event_id").alias("id"),
        "ts",
        F.col("props").alias("text"),
        F.array(
            F.col("event_type"),
            F.when(F.col("value") >= 100, F.lit("high")).otherwise(F.lit("low")),
        ).alias("tags"),
    )
    qt = F.array(F.lit("error"), F.lit("high"))
    return (
        comments.filter(
            F.col("ts").between(F.lit(T0).cast("timestamp"), F.lit(T1).cast("timestamp"))
            & (F.size(F.array_intersect(F.col("tags"), qt)) == 2)
        )
        .orderBy("ts", "id")
        .limit(20)
        .select("id", "ts", "text")
    )


# ------------------------------------------------------------------ A2/ST3
@register("ts_incremental_merge", oracle=_agg_oracle(100))
def ts_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/ST3 in the correctness gate: the month of events ingested as
    three successive batches (as a streaming backfill would), each
    aggregated independently and merged with combine_rollups — the
    oracle aggregates the whole table in one pass. Equality IS the
    reference's _combine_aggregations law (src/index.py:328-374)
    under arbitrary batch boundaries."""
    from open_tlm_spark.operators.rollup import combine_rollups

    pts = _points(spark)
    cuts = ["2024-01-08 00:00:00", "2024-01-20 00:00:00"]
    b1 = pts.filter(F.col("ts") < F.lit(cuts[0]).cast("timestamp"))
    b2 = pts.filter(
        (F.col("ts") >= F.lit(cuts[0]).cast("timestamp"))
        & (F.col("ts") < F.lit(cuts[1]).cast("timestamp"))
    )
    b3 = pts.filter(F.col("ts") >= F.lit(cuts[1]).cast("timestamp"))
    acc = aggregate_points(b1, 100)
    for b in (b2, b3):
        acc = combine_rollups(acc, aggregate_points(b, 100))
    out = with_mean(acc)
    return out.select(
        "dataset_id",
        "bin_ts",
        "min_value",
        "max_value",
        _round6("sum_values").alias("sum_values"),
        "count",
        _round6("mean_value").alias("mean_value"),
    )


# --------------------------------------------------------- A6 per-series
@register(
    "ts_histogram_per_series",
    oracle="""
    WITH stats AS (
      SELECT event_type, min(value) AS lo, max(value) AS hi,
             count(DISTINCT value) AS n_distinct
      FROM events GROUP BY event_type
    ),
    b AS (
      SELECT e.event_type AS dataset_id,
             CASE WHEN s.hi = s.lo THEN 0
                  ELSE least(
                    CAST(floor((e.value - s.lo) /
                         ((s.hi - s.lo) / least(s.n_distinct, 30))) AS BIGINT),
                    least(s.n_distinct, 30) - 1)
             END AS bucket
      FROM events e JOIN stats s USING (event_type)
    )
    SELECT dataset_id, bucket, count(*) AS n
    FROM b GROUP BY dataset_id, bucket
    """,
)
def ts_histogram_per_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 faithful form: the reference renders ONE histogram PER
    dataset (public/histogram.js render_one loop) — per-group stats
    broadcast back onto the facts, single bucket-count aggregation."""
    from open_tlm_spark.operators.histogram import histogram_per_group

    return histogram_per_group(_points(spark), "dataset_id", "value", 30)


# ----------------------------------------------------------- derivative
@register(
    "ts_derivative",
    oracle="""
    SELECT event_type AS dataset_id, ts, value,
           round((value - lag(value) OVER w) /
                 ((epoch_us(ts) - epoch_us(lag(ts) OVER w)) / 1000000.0),
                 6) AS dv_dt
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY ts)
    """,
)
def ts_derivative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-of-change per series (dv/dt via lag) — the classic
    counter-to-rate transform (§2.5 extension; the reference has no
    analytics windows at all)."""
    from open_tlm_spark.operators.timeseries import derivative

    return derivative(_points(spark))


# ------------------------------------------------------------- gap fill
_GRID_START = 1704067200  # 2024-01-01T00:00:00Z
_GRID_END = 1704067200 + 86400 * 7
_GRID_STEP = 3600


@register(
    "ts_gap_fill",
    oracle=f"""
    WITH grid AS (
      SELECT e.event_type AS dataset_id, t.g AS grid_ts
      FROM (SELECT DISTINCT event_type FROM events) e,
           UNNEST(range({_GRID_START}, {_GRID_END} + 1, {_GRID_STEP})) t(g)
    ),
    p AS (
      SELECT event_type AS dataset_id,
             epoch_us(ts) / 1000000.0 AS ts_s, value
      FROM events
    )
    SELECT grid.dataset_id, grid.grid_ts, p.value AS filled_value
    FROM grid ASOF LEFT JOIN p
      ON grid.dataset_id = p.dataset_id AND grid.grid_ts >= p.ts_s
    """,
)
def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-grid resampling with forward fill (hourly grid over the
    first week): union-tag + windowed carry-forward — one shuffle, no
    range-join explosion (operators/timeseries.py). Ticks before a
    series' first point stay NULL (left-asof semantics)."""
    from open_tlm_spark.operators.timeseries import gap_fill

    return gap_fill(_points(spark), _GRID_STEP, _GRID_START, _GRID_END)


# ----------------------------------------------------------------- EWMA
@register(
    "ts_ewma",
    # The linear recurrence IS expressible in DuckDB via a per-series
    # list() + per-row prefix list_reduce fold (O(n^2) per series —
    # oracle-only cost, the engine path stays O(n)). Fold op order
    # (acc*(1-a) + a*x) matches pandas ewm(adjust=False) bitwise;
    # both sides round to 6dp.
    oracle="""
    WITH s AS (
      SELECT event_type AS dataset_id,
             list(ts ORDER BY ts) AS tss,
             list(value ORDER BY ts) AS vals
      FROM events GROUP BY 1
    ),
    u AS (
      SELECT dataset_id,
             unnest(tss) AS ts,
             unnest(vals) AS value,
             unnest(range(1, len(vals) + 1)) AS i,
             vals
      FROM s
    )
    SELECT dataset_id, ts, value,
           round(list_reduce(vals[1:i], (acc, x) -> acc * 0.7 + 0.3 * x), 6) AS ewma
    FROM u
    """,
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA smoothing per series (alpha=0.3): inherently sequential,
    so it runs as an Arrow-batched grouped-map kernel (applyInPandas)
    — one shuffle on the series key, vectorized within each series."""
    from open_tlm_spark.operators.timeseries import ewma

    return ewma(_points(spark), alpha=0.3).withColumn("ewma", F.round("ewma", 6))


# ------------------------------------------------------- store round-trip
@register(
    "store_roundtrip_rollup",
    bench=False,  # ingests state each run — correctness gate only
    stateful=True,  # drives TelemetryStore.put at build time
    oracle=f"""
    SELECT event_type AS dataset_id,
           (epoch_us(ts) // (1000::BIGINT * 1000000)) * 1000 AS bin_ts,
           min(value) AS min_value,
           round(sum(value) / count(value), 6) AS mean_value,
           max(value) AS max_value,
           round(sum(value), 6) AS sum_values,
           count(value) AS count
    FROM events
    GROUP BY 1, 2
    """,
)
def store_roundtrip_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end STORE check inside the gate: ingest the whole events
    table through TelemetryStore.put (validate -> dedup -> raw append
    -> 6 materialized rollup levels), then answer from the STORED
    1000 s rollup via the routed get() path. The oracle aggregates the
    source directly — equality proves the persisted pyramid, not just
    the in-flight plan."""
    import datetime as _dtm
    import tempfile

    from open_tlm_spark.store import TelemetryStore

    store = TelemetryStore(spark, tempfile.mkdtemp(prefix="tlm_gate_"))
    store.put(_points(spark))
    lo = _dtm.datetime(2023, 12, 31, tzinfo=_dtm.timezone.utc)
    hi = _dtm.datetime(2024, 2, 2, tzinfo=_dtm.timezone.utc)
    # All-series read is ONE plan (dataset_id=None) — no driver-side
    # per-series loop / N-branch union; the guard is routed around by
    # passing the full-catalog intent explicitly.
    out = store.get(None, lo, hi, fidelity=1000)
    return out.select(
        "dataset_id",
        "bin_ts",
        "min_value",
        F.round("mean_value", 6).alias("mean_value"),
        "max_value",
        F.round("sum_values", 6).alias("sum_values"),
        "count",
    )


# ----------------------------------------------------------------- A9/S12
@register(
    "metrics_loop_series",
    bench=False,  # ingests state each run — correctness gate only
    stateful=True,  # put/get/flush harness loop runs driver actions
    oracle="""
    WITH n AS (
      SELECT CAST(least(3, count(DISTINCT CAST(ts AS DATE))) AS BIGINT) AS d
      FROM events
    )
    SELECT 'tlm.metrics.num_gets' AS dataset_id, d AS n_samples,
           CAST(d AS DOUBLE) AS last_value
    FROM n
    UNION ALL
    SELECT 'tlm.metrics.num_puts' AS dataset_id, d AS n_samples,
           CAST(d AS DOUBLE) AS last_value
    FROM n
    """,
)
def metrics_loop_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9/S12 end-to-end: drive the store with one put + one get per
    day for the first 3 event days, flush_metrics() after each cycle
    (the reference's poll/flush loop, src/metrics/loop.py:59-61), then
    read num_puts/num_gets back FROM THE STORE as ordinary series.
    Counter samples are 1,2,3 -> n_samples=3, last_value=3.0 per
    series; the oracle derives the same from the events table alone,
    so equality proves counters route through the full ingest path
    (validate -> raw append -> rollup cascade) and back out get()."""
    import datetime as _dtm
    import tempfile

    from open_tlm_spark.store import TelemetryStore

    ev = spark.table("events")
    days = sorted(
        r[0] for r in ev.select(F.to_date("ts").alias("d")).distinct().collect()
    )[:3]
    store = TelemetryStore(spark, tempfile.mkdtemp(prefix="tlm_metrics_"))
    pts = _points(spark)
    for i, day in enumerate(days):
        store.put(pts.filter(F.to_date("ts") == F.lit(day)))
        lo = _dtm.datetime.combine(day, _dtm.time(), tzinfo=_dtm.timezone.utc)
        store.get("purchase", lo, lo + _dtm.timedelta(days=1), fidelity=None)
        store.flush_metrics(_dtm.datetime(2030, 1, 1, 0, 0, i, tzinfo=_dtm.timezone.utc))
    lo = _dtm.datetime(2030, 1, 1, tzinfo=_dtm.timezone.utc)
    hi = _dtm.datetime(2030, 1, 1, 0, 1, tzinfo=_dtm.timezone.utc)
    out = store.get(
        ["tlm.metrics.num_puts", "tlm.metrics.num_gets"], lo, hi, fidelity=None
    )
    return out.groupBy("dataset_id").agg(
        F.count("value").alias("n_samples"),
        F.max("value").alias("last_value"),
    )


# ------------------------------------------------------------------- skew
@register(
    "skew_salted_agg",
    oracle="""
    SELECT event_type AS dataset_id,
           (epoch_us(ts) // (3600::BIGINT * 1000000)) * 3600 AS bin_ts,
           min(value) AS min_value,
           max(value) AS max_value,
           round(sum(value), 6) AS sum_values,
           count(value) AS count
    FROM events
    GROUP BY 1, 2
    """,
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-stage tumbling aggregate (operators/skew.py): the
    hot-key remedy when one series dominates a bin — stage 1 fans
    each (dataset_id, bin) over 16 salt reducers, stage 2 merges the
    algebraic partials. Results are IDENTICAL to the plain aggregate
    (the oracle is the unsalted SQL); only the shuffle balance
    changes — which is the point."""
    from open_tlm_spark.functions.time import floor_to
    from open_tlm_spark.operators.skew import salted_rollup

    out = salted_rollup(_points(spark), floor_to("ts", 3600))
    return out.select(
        "dataset_id",
        "bin_ts",
        "min_value",
        "max_value",
        F.round("sum_values", 6).alias("sum_values"),
        "count",
    )
