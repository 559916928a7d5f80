"""Derived time-series operators: derivative, gap-fill with
carry-forward, EWMA smoothing.

Natural engine-level extensions the reference leaves to the browser
(SURVEY.md §2.5 — no window functions in the reference). All are
single-shuffle window constructions except EWMA, which is inherently
recursive and uses an Arrow-batched grouped-map kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def derivative(points: DataFrame) -> DataFrame:
    """dv/dt per series: (value - lag(value)) / seconds since the
    previous point. First point of each series -> NULL. One shuffle
    on dataset_id; sort shared by both lags."""
    w = Window.partitionBy("dataset_id").orderBy("ts")
    dt_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    dv = F.col("value") - F.lag("value").over(w)
    return points.select(
        "dataset_id",
        "ts",
        "value",
        F.round(dv / (dt_us / F.lit(1_000_000.0)), 6).alias("dv_dt"),
    )


def gap_fill(
    points: DataFrame,
    step_s: int,
    start_ts: int,
    end_ts: int,
) -> DataFrame:
    """Regular-grid resampling with forward fill (carry last
    observation): one row per (dataset_id, grid tick) in
    [start_ts, end_ts], value = last point at-or-before the tick.

    Construction: per-series grid via sequence+explode (no driver
    loop), union-tag with real points, windowed last-value
    carry-forward — same scale shape as the as-of join
    (operators/asof.py): one shuffle, no range-join explosion.
    """
    grid = (
        points.select("dataset_id")
        .distinct()
        .select(
            "dataset_id",
            F.explode(
                F.sequence(F.lit(start_ts), F.lit(end_ts), F.lit(step_s))
            ).alias("grid_ts"),
        )
    )
    g = grid.select(
        "dataset_id",
        F.col("grid_ts").alias("ts_s"),
        F.lit(1).alias("_is_grid"),
        F.lit(None).cast("double").alias("_val"),
    )
    p = points.select(
        "dataset_id",
        (F.unix_micros("ts") / F.lit(1_000_000.0)).alias("ts_s"),
        F.lit(0).alias("_is_grid"),
        F.col("value").alias("_val"),
    )
    # points sort before grid ticks at the same instant -> a point
    # exactly on a tick is visible to that tick (inclusive semantics)
    w = (
        Window.partitionBy("dataset_id")
        .orderBy("ts_s", "_is_grid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        g.unionByName(p)
        .withColumn("filled_value", F.last("_val", ignorenulls=True).over(w))
        .filter(F.col("_is_grid") == 1)
        .select(
            "dataset_id",
            F.col("ts_s").cast("long").alias("grid_ts"),
            "filled_value",
        )
    )


def ewma(points: DataFrame, alpha: float) -> DataFrame:
    """Exponentially weighted moving average per series.

    EWMA is a linear recurrence (each output depends on the previous),
    so it cannot be a window aggregate; the idiomatic Spark form is an
    Arrow-batched grouped-map kernel (applyInPandas): one shuffle on
    dataset_id, then a vectorized per-series pass.
    """
    import pandas as pd

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts")
        pdf["ewma"] = pdf["value"].ewm(alpha=alpha, adjust=False).mean()
        return pdf

    schema = "dataset_id string, ts timestamp, value double, ewma double"
    return points.select("dataset_id", "ts", "value").groupBy(
        "dataset_id"
    ).applyInPandas(kernel, schema)
