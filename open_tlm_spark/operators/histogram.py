"""Histogram + range summaries (SURVEY.md A6-A8).

The reference computes these browser-side (public/histogram.js:58-132,
public/axes.js:118-164); the engine subsumes them server-side as
declarative aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def histogram(
    df: DataFrame,
    value_col: str = "value",
    max_buckets: int = 30,
) -> DataFrame:
    """A6/A7: equal-width histogram with the reference's bucket rule.

    num_buckets = min(countDistinct(value), max_buckets); width =
    (max-min)/n; bucket i covers [min + i*w, min + (i+1)*w) with the
    max value clamped into the last bucket (public/histogram.js:96-118).

    Plan shape: one global agg (min/max/distinct — single reduce), one
    hash agg on bucket id. Both whole-stage-codegen'd; no UDFs.
    """
    stats = df.agg(
        F.min(value_col).alias("lo"),
        F.max(value_col).alias("hi"),
        F.count_distinct(F.col(value_col)).alias("n_distinct"),
    )
    # Cross-join the 1-row stats frame (broadcast by construction).
    with_stats = df.crossJoin(F.broadcast(stats))
    n = F.least(F.col("n_distinct"), F.lit(max_buckets))
    width = (F.col("hi") - F.col("lo")) / n
    raw_bucket = F.floor((F.col(value_col) - F.col("lo")) / width)
    bucket = F.least(raw_bucket, n - 1)  # clamp max into last bucket
    bucket = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(bucket)
    return (
        with_stats.groupBy(bucket.cast("long").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
    )


def histogram_per_group(
    df: DataFrame,
    group_col: str = "dataset_id",
    value_col: str = "value",
    max_buckets: int = 30,
) -> DataFrame:
    """A6 per-series: the reference renders one histogram per visible
    dataset (public/histogram.js render_one per dataset) — same bucket
    rule, stats computed per group and joined back (broadcast: one row
    per group)."""
    stats = df.groupBy(group_col).agg(
        F.min(value_col).alias("lo"),
        F.max(value_col).alias("hi"),
        F.count_distinct(F.col(value_col)).alias("n_distinct"),
    )
    with_stats = df.join(F.broadcast(stats), group_col)
    n = F.least(F.col("n_distinct"), F.lit(max_buckets))
    width = (F.col("hi") - F.col("lo")) / n
    raw_bucket = F.floor((F.col(value_col) - F.col("lo")) / width)
    bucket = F.least(raw_bucket, n - 1)
    bucket = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(bucket)
    return (
        with_stats.groupBy(group_col, bucket.cast("long").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def range_summary(
    df: DataFrame,
    group_col: str = "dataset_id",
    value_col: str = "value",
) -> DataFrame:
    """A8: per-series min/max/mean over a (pre-filtered) visible range
    — the y-axis autoscale aggregation (public/axes.js:118-164)."""
    return df.groupBy(group_col).agg(
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
        F.avg(value_col).alias("mean_value"),
        F.count(F.lit(1)).alias("count"),
    )
