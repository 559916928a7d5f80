"""Continuous ANN-index intake: embeddings land as files, each
micro-batch is assigned to its IVF cell and appended to the persisted
index — the vector-side twin of `streaming/incremental_dedup.py`.

Idempotency is layered: `IVFIndex.add` is itself idempotent per
(intake, epoch) — the assignments table is partitioned by
(centroid_id, epoch) and written with dynamic partition overwrite, so
a replayed batch REPLACES its own epoch partitions (this closes even
the crash window between the write and any bookkeeping). On top, a
tiny state file records the last applied batch id (atomic rename) so
clean replays skip the write entirely. Batch ids from Structured
Streaming are monotonically increasing, so `<= last` means "already
in the index"; the stream maps batch_id -> epoch = batch_id + 1
(epoch 0 belongs to the base build).

Scale: each intake touches only the cell partitions its vectors land
in; the index never rewrites existing cells, and serving (flat, PQ,
or ADC+re-rank) sees new vectors as soon as their files land.
Centroid drift under sustained intake is a REBUILD decision — watch
`assignments().groupBy("centroid_id").count()` skew, don't patch it.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from open_tlm_spark.operators.ivf_store import IVFIndex

EMBEDDING_STREAM_SCHEMA = "vec_id bigint, embedding array<double>"


class _BatchGate:
    """last-applied-batch-id gate (atomic rename), shared shape with
    HeavyHittersStore's replay guard."""

    def __init__(self, path: str):
        self.path = path

    def last(self) -> int | None:
        if not os.path.exists(self.path):
            return None
        with open(self.path, encoding="utf-8") as f:
            return json.load(f).get("last_batch_id")

    def applied(self, batch_id: int) -> bool:
        last = self.last()
        return last is not None and batch_id <= last

    def record(self, batch_id: int) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump({"last_batch_id": batch_id}, f)
        os.replace(tmp, self.path)


def start_ivf_intake(
    spark: SparkSession,
    landing_dir: str,
    index_path: str,
    checkpoint_dir: str,
    dim: int = 64,
    trigger_seconds: float = 1.0,
):
    """Stream embeddings from a JSON landing dir into an EXISTING
    IVFIndex (build it first — intake assigns to fixed centroids).
    maxFilesPerTrigger=1 keeps arrival granularity at the file level.
    Returns (query, index)."""
    idx = IVFIndex(spark, index_path)
    if not idx.exists():
        raise FileNotFoundError(
            f"no IVF index at {index_path}: build before streaming intake"
        )
    gate = _BatchGate(os.path.join(index_path, "intake_state.json"))
    stream = (
        spark.readStream.schema(EMBEDDING_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(landing_dir)
    )

    def _sink(batch: DataFrame, batch_id: int) -> None:
        if gate.applied(batch_id):
            return  # clean replay: skip the write entirely
        # epoch = batch_id + 1 (build owns epoch 0); the write itself
        # is idempotent per epoch, so a crash between add and record
        # leaves a replay that overwrites identically
        idx.add(batch, dim=dim, epoch=batch_id + 1)
        gate.record(batch_id)

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    ), idx
