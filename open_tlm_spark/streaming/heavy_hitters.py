"""Heavy hitters over unbounded streams — Misra-Gries summaries.

Beyond reference parity (the reference computes nothing approximate;
its per-series counters are exact, src/metrics/loop.py): hot-key
detection is what a 100 TB pipeline runs BEFORE the expensive jobs —
the keys this operator surfaces are the ones that need salting
(operators/skew.py) or bucket caps (operators/dedup.py max_df)
downstream.

Algorithm (public, classic): Misra & Gries 1982 — k counters give,
over n observations, estimated counts that undercount true counts by
at most n/k, and every key with true count > n/k is guaranteed
present. Summaries are MERGEABLE with the same bound (Agarwal et al.,
"Mergeable Summaries", PODS 2012): merge = add counters, then subtract
the (k+1)-th largest weight from all and drop non-positives.

Distributed shape: each input partition folds to its own k-counter
summary inside one Arrow-batched mapInPandas pass (state is k dict
entries per partition, NOT the partition's distinct-key set), the
per-partition summaries (<= partitions x k rows) merge driver-side,
and in streaming the merged batch summary folds into a persistent
summary in foreachBatch. Memory is O(k) everywhere regardless of
stream length or key cardinality — the property a groupBy-count
cannot offer on an unbounded stream.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SUMMARY_SCHEMA = "key string, weight long"


def _mg_update(counters: dict[str, int], key: str, w: int, k: int) -> None:
    """Standard Misra-Gries update: increment if tracked or a slot is
    free, else decrement ALL counters by the offered weight's share
    (batched: subtract the eviction amount once)."""
    if key in counters:
        counters[key] += w
        return
    if len(counters) < k:
        counters[key] = w
        return
    # evict: subtract min(w, current minimum) from everyone; repeat
    # until the new key fits or its weight is absorbed
    while w > 0:
        m = min(counters.values())
        if w < m:
            for c in list(counters):
                counters[c] -= w
            return
        w -= m
        for c in list(counters):
            counters[c] -= m
            if counters[c] <= 0:
                del counters[c]
        if len(counters) < k:
            if w > 0:
                counters[key] = w
            return


def mg_merge(a: dict[str, int], b: dict[str, int], k: int) -> dict[str, int]:
    """Mergeable-summaries combine: sum counters, keep top k after
    subtracting the (k+1)-th largest (Agarwal et al. 2012 §3.1)."""
    out = dict(a)
    for key, w in b.items():
        out[key] = out.get(key, 0) + w
    if len(out) <= k:
        return out
    weights = sorted(out.values(), reverse=True)
    cut = weights[k]
    return {key: w - cut for key, w in out.items() if w - cut > 0}


def mg_summarize(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries of `key_col` as a
    (<= partitions x k)-row DataFrame (key, weight). One Arrow pass,
    O(k) state per partition; merge the result with `mg_collect` for
    the global summary."""

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for key, cnt in pdf[key_col].value_counts().items():
                _mg_update(counters, str(key), int(cnt), k)
        yield pd.DataFrame(
            {"key": list(counters), "weight": list(counters.values())}
        ).astype({"key": "string", "weight": "int64"})

    return df.select(key_col).mapInPandas(fold, SUMMARY_SCHEMA)


def mg_collect(summaries: DataFrame, k: int) -> dict[str, int]:
    """Merge per-partition summaries (a tiny frame) driver-side: sum
    same-key counters across partitions, then one top-k cut — the
    associative MERGE of the mergeable-summaries construction (never
    subtracts more than pairwise merging would, so the n/(k+1) error
    bound holds a fortiori)."""
    summed: dict[str, int] = {}
    for r in summaries.collect():
        summed[r.key] = summed.get(r.key, 0) + r.weight
    return mg_merge({}, summed, k)


class HeavyHittersStore:
    """Persistent stream summary: fold each micro-batch's distributed
    summary into a JSON-backed k-counter state (atomic rename).

    Replay-safe (ADVICE r7): the state file records the last applied
    batch id; foreachBatch is at-least-once, and a micro-batch replayed
    after a crash (state written, checkpoint not committed) must NOT
    merge a second time — double-merging inflates weights past the
    documented n/(k+1) error bound. Batch ids from Structured Streaming
    are monotonically increasing, so `batch_id <= last applied` means
    "already folded in; skip"."""

    def __init__(self, path: str, k: int):
        self.path = path
        self.k = k

    def _read(self) -> tuple[int | None, dict[str, int]]:
        if not os.path.exists(self.path):
            return None, {}
        with open(self.path, encoding="utf-8") as f:
            data = json.load(f)
        if "counters" in data:
            last = data.get("last_batch_id")
            return last, {k: int(v) for k, v in data["counters"].items()}
        return None, {k: int(v) for k, v in data.items()}  # legacy flat

    def load(self) -> dict[str, int]:
        return self._read()[1]

    def update(
        self, batch: DataFrame, key_col: str, batch_id: int | None = None
    ) -> dict[str, int]:
        last, counters = self._read()
        if batch_id is not None and last is not None and batch_id <= last:
            return counters  # at-least-once replay: already applied
        batch_summary = mg_collect(
            mg_summarize(batch, key_col, self.k), self.k
        )
        merged = mg_merge(counters, batch_summary, self.k)
        tmp = self.path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(
                {
                    "last_batch_id": batch_id if batch_id is not None else last,
                    "counters": merged,
                },
                f,
            )
        os.replace(tmp, self.path)
        return merged


def start_heavy_hitters(
    spark: SparkSession,
    landing_dir: str,
    key_col: str,
    state_path: str,
    checkpoint_dir: str,
    k: int = 16,
    trigger_seconds: float = 1.0,
):
    """Continuous hot-key watch over a JSON file landing dir: each
    micro-batch folds into the persistent Misra-Gries summary. Returns
    (query, store)."""
    store = HeavyHittersStore(state_path, k)
    stream = (
        spark.readStream.schema(f"{key_col} string")
        .option("maxFilesPerTrigger", 1)
        .json(landing_dir)
    )

    def _sink(batch: DataFrame, batch_id: int) -> None:
        store.update(batch, key_col, batch_id=batch_id)

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    ), store
