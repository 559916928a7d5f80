"""Live per-series quantile bands over unbounded streams.

The streaming companion of the batch `ts_percentile_bands` gate query
(plans/selection_queries.py): a dashboard wants p10/p50/p90 per
series updated as points arrive, but exact percentiles buffer every
value — unbounded state on an unbounded stream.

Design: a DETERMINISTIC bottom-R sample per series. Every point gets
a priority = xxhash64(series, epoch-us, value) computed JVM-side
(whole-stage codegen) BEFORE the stateful operator; the per-series
state is the R pairs with the smallest priorities seen so far (a
bottom-k sketch — the mergeable, order-free form of reservoir
sampling: the bottom-R of a union is the bottom-R of the parts'
bottom-Rs, so micro-batch boundaries and replays CANNOT change the
sample — the stream holds the bit-identical sample a batch replay
selects, hence identical sample sizes/counts and band values equal
to interpolation-arithmetic order (~1 ulp; proven in
tests/test_streaming_quantiles.py). Quantiles over the sample are
exact interpolated quantiles of an R-point uniform-without-replacement
subsample: estimation error is the sampling error (~1/sqrt(R)
quantile deviation), honest and bounded, with O(R) state per series
forever.

applyInPandasWithState carries (priorities, values) arrays per
series; each micro-batch emits one row per touched series with the
current band estimate and the sample-fill ratio.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

R_DEFAULT = 256
OUTPUT_SCHEMA = (
    "dataset_id string, n_seen long, n_sample int, "
    "p10 double, p50 double, p90 double"
)
STATE_SCHEMA = "n_seen long, prios array<long>, vals array<double>"
QUANTS = (0.10, 0.50, 0.90)


def with_priority(points: DataFrame) -> DataFrame:
    """Attach the deterministic sampling priority (codegen'd; the
    same expression works on a static frame for batch replays)."""
    return points.withColumn(
        "prio",
        F.xxhash64("dataset_id", F.unix_micros("ts"), "value"),
    )


def bottom_r(prios: np.ndarray, vals: np.ndarray, r: int):
    """Keep the r smallest priorities (ties broken by value for full
    determinism — xxhash64 collisions are 2^-64 but cheap to close)."""
    if len(prios) <= r:
        order = np.lexsort((vals, prios))
        return prios[order], vals[order]
    order = np.lexsort((vals, prios))[:r]
    return prios[order], vals[order]


def sample_quantiles(vals: np.ndarray) -> list[float]:
    return [float(np.quantile(vals, q, method="linear")) for q in QUANTS]


def _kernel(r: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n_seen, prios, vals = state.get
            prios = np.asarray(prios, dtype="int64")
            vals = np.asarray(vals, dtype="float64")
        else:
            n_seen = 0
            prios = np.empty(0, dtype="int64")
            vals = np.empty(0, dtype="float64")
        for pdf in pdfs:
            n_seen += len(pdf)
            prios = np.concatenate(
                [prios, pdf["prio"].to_numpy("int64")]
            )
            vals = np.concatenate(
                [vals, pdf["value"].to_numpy("float64")]
            )
            prios, vals = bottom_r(prios, vals, r)
        p10, p50, p90 = sample_quantiles(vals)
        state.update((int(n_seen), [int(p) for p in prios], [float(v) for v in vals]))
        yield pd.DataFrame(
            {
                "dataset_id": [key[0]],
                "n_seen": [n_seen],
                "n_sample": [len(vals)],
                "p10": [p10],
                "p50": [p50],
                "p90": [p90],
            }
        )

    return fn


def quantile_band_stream(
    points_stream: DataFrame, r: int = R_DEFAULT
) -> DataFrame:
    """points (dataset_id, ts, value) stream -> one band row per
    touched series per micro-batch. State: R (priority, value) pairs
    + a counter per series."""
    return (
        with_priority(points_stream)
        .groupBy("dataset_id")
        .applyInPandasWithState(
            _kernel(r),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            # append: each micro-batch appends the refreshed band row
            # (consumers keep the max-n_seen row per series); 'update'
            # would forbid append-mode file sinks
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def quantile_band_batch(points: DataFrame, r: int = R_DEFAULT) -> DataFrame:
    """Batch replay of the identical estimator: bottom-R per series by
    the same priority column, quantiles over the sample — what the
    stream must reproduce bit-for-bit at any micro-batch slicing.
    (One window shuffle on the series key; the live path never
    re-reads history.)"""
    from pyspark.sql import Window

    w = Window.partitionBy("dataset_id").orderBy("prio", "value")
    ranked = (
        with_priority(points)
        .withColumn("rn", F.row_number().over(w))
    )
    sample = ranked.filter(F.col("rn") <= r)
    totals = points.groupBy("dataset_id").agg(
        F.count(F.lit(1)).alias("n_seen")
    )
    bands = sample.groupBy("dataset_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_sample"),
        F.expr("percentile(value, 0.10)").alias("p10"),
        F.expr("percentile(value, 0.50)").alias("p50"),
        F.expr("percentile(value, 0.90)").alias("p90"),
    )
    return totals.join(bands, "dataset_id").select(
        "dataset_id", "n_seen", "n_sample", "p10", "p50", "p90"
    )
