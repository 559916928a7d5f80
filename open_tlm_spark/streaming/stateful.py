"""Custom stateful streaming operators (applyInPandasWithState).

SURVEY.md's build guidance reserves applyInPandasWithState for
operators that genuinely need cross-batch per-key state. EWMA
smoothing is exactly that: a linear recurrence whose value at the
start of micro-batch N depends on everything seen in batches 0..N-1.

State per series: (last_ewma,). Each micro-batch sorts its rows by
event time, continues the recurrence from the stored state, emits the
smoothed rows, and writes the tail value back. Arrow-batched both
ways; one shuffle on the series key per micro-batch.

Caveat (documented, inherent to processing-time recurrences): rows
arriving in a LATER micro-batch than their event time ("late data")
are smoothed in arrival order, not global event order — a recurrence
cannot be retro-corrected without reprocessing; bounded-lateness
deployments should front this with a watermarked sort, and backfills
should use the batch operator (operators/timeseries.ewma).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "dataset_id string, ts timestamp, value double, ewma double"
STATE_SCHEMA = "last_ewma double"


def _ewma_kernel(alpha: float):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (last,) = state.get if state.exists else (None,)
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            out = []
            for v in pdf["value"]:
                last = v if last is None else (1 - alpha) * last + alpha * v
                out.append(last)
            pdf = pdf.assign(ewma=out)
            yield pdf[["dataset_id", "ts", "value", "ewma"]]
        if last is not None:
            state.update((float(last),))

    return fn


def ewma_stream(points_stream: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Continuously smoothed stream: emits every input point with its
    EWMA, carrying the recurrence across micro-batches via GroupState."""
    return points_stream.groupBy("dataset_id").applyInPandasWithState(
        _ewma_kernel(alpha),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ANOMALY_OUTPUT_SCHEMA = (
    "dataset_id string, ts timestamp, value double, "
    "zscore double, is_anomaly boolean"
)
ANOMALY_STATE_SCHEMA = "n long, mean double, m2 double"


def _anomaly_kernel(z_threshold: float, min_points: int):
    def fn(
        key,
        pdfs,
        state: GroupState,
    ):
        import math

        n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            zs, flags = [], []
            for v in pdf["value"]:
                # score against the PRE-update baseline so a spike
                # can't mask itself, then fold it in (Welford)
                if n >= min_points:
                    var = m2 / (n - 1) if n > 1 else 0.0
                    sd = math.sqrt(var)
                    z = (v - mean) / sd if sd > 0 else 0.0
                else:
                    z = 0.0
                zs.append(z)
                flags.append(abs(z) >= z_threshold and n >= min_points)
                n += 1
                delta = v - mean
                mean += delta / n
                m2 += delta * (v - mean)
            pdf = pdf.assign(zscore=zs, is_anomaly=flags)
            yield pdf[
                ["dataset_id", "ts", "value", "zscore", "is_anomaly"]
            ]
        state.update((int(n), float(mean), float(m2)))

    return fn


def anomaly_stream(
    points_stream: DataFrame,
    z_threshold: float = 3.0,
    min_points: int = 30,
) -> DataFrame:
    """Live z-score anomaly flags (batch companion:
    ts_anomaly_zscore): per-series running mean/variance via
    Welford's online algorithm (1962, the numerically-stable
    single-pass recurrence) carried across micro-batches in
    GroupState — state is THREE numbers per series regardless of
    stream length. Each point is scored against the baseline BEFORE
    it is folded in, so a large spike cannot suppress its own flag;
    the first `min_points` points only warm the baseline.

    Same late-data caveat as ewma_stream: a processing-time
    recurrence scores in arrival order; backfills belong to the
    batch operator."""
    return points_stream.groupBy("dataset_id").applyInPandasWithState(
        _anomaly_kernel(z_threshold, min_points),
        outputStructType=ANOMALY_OUTPUT_SCHEMA,
        stateStructType=ANOMALY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
