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


def holt_linear(points: DataFrame, alpha: float, beta: float) -> DataFrame:
    """Holt's linear-trend double exponential smoothing per series:

        l_t = alpha * x_t + (1 - alpha) * (l_{t-1} + b_{t-1})
        b_t = beta * (l_t - l_{t-1}) + (1 - beta) * b_{t-1}

    with l_1 = x_1, b_1 = 0 (Holt 1957 / Hyndman & Athanasopoulos,
    'Forecasting: Principles and Practice' — public technique). Like
    EWMA this is a two-state linear recurrence, so it runs as an
    Arrow-batched grouped-map kernel: one shuffle on the series key,
    then a sequential per-series pass. The per-point Python loop is
    the honest cost of a stateful recurrence — it is per-series local,
    so a 1000-executor cluster runs every series' loop in parallel
    and no state ever crosses a partition boundary.
    """
    import pandas as pd

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"], ignore_index=True)
        xs = pdf["value"].to_numpy()
        levels = [0.0] * len(xs)
        trends = [0.0] * len(xs)
        if len(xs):
            lvl, trd = float(xs[0]), 0.0
            levels[0], trends[0] = lvl, trd
            for i in range(1, len(xs)):
                x = float(xs[i])
                # Literal op order mirrored by the DuckDB fold oracle
                # (plans/analytics_queries.ts_holt_linear) so doubles
                # are bit-identical across engines.
                new_lvl = alpha * x + (1.0 - alpha) * (lvl + trd)
                trd = beta * (new_lvl - lvl) + (1.0 - beta) * trd
                lvl = new_lvl
                levels[i], trends[i] = lvl, trd
        pdf["level"] = levels
        pdf["trend"] = trends
        return pdf

    schema = (
        "dataset_id string, event_id bigint, ts timestamp, value double,"
        " level double, trend double"
    )
    return (
        points.select("dataset_id", "event_id", "ts", "value")
        .groupBy("dataset_id")
        .applyInPandas(kernel, schema)
    )
