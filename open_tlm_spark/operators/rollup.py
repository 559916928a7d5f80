"""Tumbling-window aggregation + multi-resolution rollup cascade.

The heart of the reference engine (SURVEY.md §2.4):
  * A1 tumbling aggregate    — reference Index._aggregate
    (src/index.py:277-326): single sorted pass; here a hash
    aggregation ``groupBy(dataset_id, floor_to(ts, d))`` — no sort
    needed, map-side partial aggregation is automatic, and the plan
    is one shuffle on (dataset_id, bin) regardless of input order.
  * A2 partial-aggregate merge — reference Index._combine_aggregations
    (src/index.py:328-374): min/max/sum/count are algebraic, so the
    merge is a re-aggregation; used for incremental rollup
    maintenance with unbounded lateness (SURVEY.md ST3).
  * A3 rollup cascade        — reference Index.put's six per-level
    passes (src/index.py:137-177). Coarser levels re-aggregate the
    next-finer level (min(min), max(max), sum(sum), sum(count)) so
    one shuffle per level reads ~10x less data than raw each step.
  * A4 mean derivation       — sum/count at read (src/index.py:588).
  * O2 fidelity routing      — reference Index._recommended_fidelity
    thresholds (src/index.py:252-275): pick the coarsest level whose
    bin count over the range stays ≈ DATAPOINT_GROUP_SIZE (5000).

Scale notes (100 TB): the aggregate is a single hash-partition
shuffle keyed on (dataset_id, bin) — high cardinality, naturally
balanced unless one series dominates; AQE skew-split handles that.
Rollup tables are ~1/d the size of raw, so every level beyond 1 s is
cheap to maintain and trivially cacheable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_tlm_spark.functions.time import floor_to
from open_tlm_spark.schemas import FIDELITIES

# Reference design-point constants (src/index.py:45-57).
DATAPOINT_GROUP_SIZE = 5000
MAX_DURATION_FULL = DATAPOINT_GROUP_SIZE / 10  # tuned for 10 Hz


def aggregate_points(points: DataFrame, duration_s: int) -> DataFrame:
    """A1: one aggregated row per (dataset_id, duration-truncated bin).

    Output schema = ROLLUP_SCHEMA. Bin semantics match the reference
    exactly: bin id = floor-truncated epoch seconds.
    """
    return points.groupBy(
        "dataset_id", floor_to("ts", duration_s).alias("bin_ts")
    ).agg(
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.sum("value").alias("sum_values"),
        F.count("value").alias("count"),
    )


def cascade_from_finer(finer: DataFrame, duration_s: int) -> DataFrame:
    """A3: build rollup level ``duration_s`` from a finer rollup level.

    Rollup levels compose because the aggregates are algebraic —
    identical to Spark's own partial/final aggregation split.
    """
    return finer.groupBy(
        "dataset_id",
        (F.floor(F.col("bin_ts") / duration_s) * duration_s).alias("bin_ts"),
    ).agg(
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
        F.sum("sum_values").alias("sum_values"),
        F.sum("count").alias("count"),
    )


def combine_rollups(a: DataFrame, b: DataFrame) -> DataFrame:
    """A2/J1: merge two partial rollups at the same level.

    The reference's sorted two-pointer merge (src/index.py:328-374)
    becomes union + re-aggregate — associative, order-independent,
    and distributed. Law: combine(agg(A), agg(B)) == agg(A ∪ B).
    """
    return (
        a.unionByName(b)
        .groupBy("dataset_id", "bin_ts")
        .agg(
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
            F.sum("sum_values").alias("sum_values"),
            F.sum("count").alias("count"),
        )
    )


def build_rollup_cascade(points: DataFrame) -> dict[int, DataFrame]:
    """A3/O1: all six rollup levels, each re-aggregated from the
    previous (finer) one — the finest level is the only pass over raw
    data."""
    out: dict[int, DataFrame] = {}
    finer = None
    for d in FIDELITIES:
        out[d] = aggregate_points(points, d) if finer is None else cascade_from_finer(finer, d)
        finer = out[d]
    return out


def with_mean(rollup: DataFrame) -> DataFrame:
    """A4: derive mean at read time; sum+count stay the stored truth."""
    return rollup.withColumn(
        "mean_value", F.col("sum_values") / F.col("count")
    )


def recommended_fidelity(range_duration_s: float) -> int | None:
    """O2 router: None = FULL fidelity, else a rollup duration.

    Thresholds are the reference's (src/index.py:252-275): the
    coarsest level that keeps the response near 5000 points.
    """
    if range_duration_s < MAX_DURATION_FULL:
        return None
    for d in FIDELITIES[:-1]:
        if range_duration_s < DATAPOINT_GROUP_SIZE * d:
            return d
    return FIDELITIES[-1]
