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
