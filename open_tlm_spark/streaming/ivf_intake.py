"""Continuous ANN-index intake: embeddings land as files, each
micro-batch is assigned to its IVF cell and appended to the persisted
index — the vector-side twin of `streaming/incremental_dedup.py`.

Idempotency is layered: `IVFIndex.add` is itself idempotent per
(intake, epoch) — the assignments table is partitioned by
(centroid_id, epoch) and written with dynamic partition overwrite, so
a replayed batch REPLACES its own epoch partitions (this closes even
the crash window between the write and any bookkeeping). On top, a
tiny state file records the last applied batch id plus a MONOTONE
epoch counter and the owning stream's checkpoint identity (atomic
rename):

  * epochs come from the counter, not from raw batch ids — a batch id
    is only unique within one checkpoint lineage, so deriving epochs
    from it would recycle epochs (and dynamically overwrite earlier
    intakes' partitions with unrelated data) if the checkpoint were
    ever reset;
  * the stream identity (Structured Streaming's checkpoint `metadata`
    query id) is verified on every batch — restarting against an
    existing index with a FRESH checkpoint restarts batch ids at 0,
    which the `<= last` replay gate would otherwise read as "already
    applied" and silently drop every new batch. Mismatch fails fast
    with the recovery instruction instead.

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


def _checkpoint_identity(
    checkpoint_dir: str, spark: SparkSession | None = None
) -> str:
    """The stream's durable identity: Structured Streaming writes a
    `metadata` JSON with the query id into the checkpoint dir at
    start, and the id survives restarts of the SAME checkpoint but
    changes when the checkpoint is recreated.

    Reads local paths directly; for non-local checkpoint locations
    (hdfs://, s3a://, file: URIs — the realistic deployment at scale)
    it goes through the Hadoop FileSystem API when a `spark` handle is
    given (ADVICE r9: an os.path probe never finds the metadata file
    there and the guard silently degraded to the path fallback). Falls
    back to the checkpoint path string only when the file is not there
    yet (pre-start probes) or no filesystem can resolve it."""
    meta = os.path.join(checkpoint_dir, "metadata")
    if os.path.exists(meta):
        with open(meta, encoding="utf-8") as f:
            ident = json.load(f).get("id")
        if ident:
            return str(ident)
    elif spark is not None:
        try:
            jvm = spark._jvm
            p = jvm.org.apache.hadoop.fs.Path(checkpoint_dir, "metadata")
            fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
            if fs.exists(p):
                stream = fs.open(p)
                try:
                    raw = jvm.org.apache.commons.io.IOUtils.toString(
                        stream, "UTF-8"
                    )
                finally:
                    stream.close()
                ident = json.loads(raw).get("id")
                if ident:
                    return str(ident)
        except Exception:
            pass  # unreachable filesystem: keep the path fallback
    return os.path.abspath(checkpoint_dir)


class _BatchGate:
    """Replay/identity gate (atomic rename), shared shape with
    HeavyHittersStore's guard plus the stream-identity check and the
    monotone epoch counter."""

    def __init__(self, path: str):
        self.path = path

    def state(self) -> dict:
        if not os.path.exists(self.path):
            return {}
        with open(self.path, encoding="utf-8") as f:
            return json.load(f)

    def check_identity(self, identity: str) -> None:
        st = self.state()
        owner = st.get("stream_id")
        if owner is not None and owner != identity:
            raise RuntimeError(
                "ivf_intake: index "
                f"{os.path.dirname(self.path)} was fed by stream "
                f"{owner!r}, but this stream is {identity!r} — a fresh "
                "checkpoint restarts batch ids and would silently drop "
                "or recycle intake epochs. Resume the original "
                "checkpoint, or delete intake_state.json AFTER "
                "compact_epochs() has folded the old intakes."
            )

    def next_epoch(self) -> int:
        st = self.state()
        if "next_epoch" in st:
            return int(st["next_epoch"])
        # legacy state (epoch = batch_id + 1): resume past the last
        # epoch that scheme can have written
        if "last_batch_id" in st:
            return int(st["last_batch_id"]) + 2
        return 1

    def applied(self, batch_id: int) -> bool:
        last = self.state().get("last_batch_id")
        return last is not None and batch_id <= last

    def record(self, batch_id: int, next_epoch: int, identity: str) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(
                {
                    "last_batch_id": batch_id,
                    "next_epoch": next_epoch,
                    "stream_id": identity,
                },
                f,
            )
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
        identity = _checkpoint_identity(checkpoint_dir, spark)
        gate.check_identity(identity)  # fail fast on checkpoint reset
        if gate.applied(batch_id):
            return  # clean replay: skip the write entirely
        # epoch from the monotone counter (build owns epoch 0); the
        # write is idempotent per epoch, and a crash between add and
        # record leaves the counter unadvanced, so the replay
        # overwrites the same epoch identically
        epoch = gate.next_epoch()
        idx.add(batch, dim=dim, epoch=epoch)
        gate.record(batch_id, epoch + 1, identity)

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    ), idx
