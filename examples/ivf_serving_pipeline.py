"""Continuous ANN serving: intake -> probe -> compact -> serve, live.

End-to-end wiring of the round-8/9 serving pieces into one loop
(VERDICT r8 #5) — the vector-side analog of what
`attribution_pipeline.py` does for live==batch analytics:

  1. BUILD both serving artifacts once from the seed corpus: the flat
     IVF index (exact vectors, cell-partitioned) and the IVF+PQ index
     (codes, ~64x smaller raw) sharing the same coarse centroids,
     with a TRAINED per-subspace codebook.
  2. INTAKE embeddings continuously from a landing dir: each
     micro-batch is assigned to its cells and landed in BOTH
     artifacts under one shared epoch — same replay/identity gate as
     `streaming/ivf_intake.py` (monotone epoch counter, checkpoint
     identity pinned, dynamic-overwrite idempotent writes).
  3. PROBE cell balance after each intake with the Misra-Gries
     hot-key probe (`operators/preflight.py`): a cell that provably
     holds an outsized share of the corpus is the rebuild signal —
     centroid drift is detected from a ~free narrow pass, never
     patched silently.
  4. COMPACT on cadence: every `compact_every` intakes, fold the
     accreted (cell, epoch) leaves of both artifacts back to epoch 0
     so file counts and delete-rewrite predicates stay bounded.
  5. SERVE rerank-by-default throughout: ADC top-r candidates from
     the PQ codes, exact cosine re-rank of those r ids against the
     flat artifact (`topk_rerank`) — near-flat recall at code-scan
     cost, and new vectors are servable as soon as their batch lands.

At 100 TB the loop is the deployment story: the corpus artifacts
outlive every session, intake touches only the cells its vectors land
in, the probe and the compactor are the two maintenance decisions,
and no step ever rescans the corpus. Tested end-to-end by
tests/test_ivf_serving_example.py (streamed dual intake == full
rebuild, compaction cadence observed, probe flags a planted hot
cell).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_tlm_spark.operators.ivf_store import (
    IVFIndex,
    IVFPQIndex,
    topk_rerank,
)
from open_tlm_spark.operators.preflight import HotKeyReport, probe_hot_keys
from open_tlm_spark.streaming.ivf_intake import (
    EMBEDDING_STREAM_SCHEMA,
    _BatchGate,
    _checkpoint_identity,
)

DIM = 64


def build_serving_indexes(
    spark: SparkSession,
    embeddings: DataFrame,
    base_dir: str,
    centroids: DataFrame | None = None,
    k: int = 8,
    dim: int = DIM,
    train_iters: int = 1,
) -> tuple[IVFIndex, IVFPQIndex]:
    """Both serving artifacts from one seed corpus, sharing coarse
    centroids (train once — the PQ build reuses the flat build's
    centroids so a query routes identically on either path)."""
    flat = IVFIndex.build(
        spark,
        embeddings,
        os.path.join(base_dir, "flat"),
        k=k,
        dim=dim,
        centroids=centroids,
    )
    pq = IVFPQIndex.build(
        spark,
        embeddings,
        os.path.join(base_dir, "pq"),
        dim=dim,
        centroids=flat.centroids(),
        train_iters=train_iters,
    )
    return flat, pq


def start_dual_intake(
    spark: SparkSession,
    landing_dir: str,
    base_dir: str,
    checkpoint_dir: str,
    dim: int = DIM,
    compact_every: int | None = None,
    trigger_seconds: float = 1.0,
):
    """Stream embeddings into BOTH artifacts under one shared epoch
    per micro-batch, compacting both every `compact_every` applied
    batches. One gate file under the base dir covers the pair — the
    two adds share an epoch, and a crash between them replays into
    idempotent dynamic overwrites on both sides."""
    flat = IVFIndex(spark, os.path.join(base_dir, "flat"))
    pq = IVFPQIndex(spark, os.path.join(base_dir, "pq"))
    if not (flat.exists() and pq.exists()):
        raise FileNotFoundError(
            f"no serving indexes under {base_dir}: build first"
        )
    gate = _BatchGate(os.path.join(base_dir, "intake_state.json"))
    stream = (
        spark.readStream.schema(EMBEDDING_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(landing_dir)
    )

    def _sink(batch: DataFrame, batch_id: int) -> None:
        identity = _checkpoint_identity(checkpoint_dir)
        gate.check_identity(identity)
        if gate.applied(batch_id):
            return
        epoch = gate.next_epoch()
        stable = batch.localCheckpoint(eager=True)  # one read, two adds
        flat.add(stable, dim=dim, epoch=epoch)
        pq.add(stable, dim=dim, epoch=epoch)
        gate.record(batch_id, epoch + 1, identity)
        if compact_every and epoch % compact_every == 0:
            flat.compact_epochs()
            pq.compact_epochs()

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    ), flat, pq


def serve_topk(
    flat: IVFIndex,
    pq: IVFPQIndex,
    queries: DataFrame,
    k: int = 5,
    r: int = 20,
    dim: int | None = None,
    nprobe: int = 1,
) -> DataFrame:
    """Rerank-by-default serving (VERDICT r8 #3): ADC candidates from
    the compressed codes, exact re-rank of only r ids from the flat
    artifact. `nprobe` widens the candidate search to more cells and
    `r` deepens it within them — the two serve-time recall knobs."""
    return topk_rerank(pq, flat, queries, k=k, r=r, dim=dim, nprobe=nprobe)


def cell_balance_report(flat: IVFIndex, k: int = 256) -> HotKeyReport:
    """One narrow probe pass over the assignments' cell column — the
    rebuild signal. No shuffle, no full groupBy: at 100 TB this is
    the cheap way to watch centroid drift under sustained intake."""
    return probe_hot_keys(flat.assignments(), "centroid_id", k=k)


def rebuild_recommended(
    report: HotKeyReport, n_cells: int, factor: float = 4.0
) -> bool:
    """True when some cell PROVABLY holds more than `factor` x its
    fair share (1/n_cells) of the corpus — probe lower bounds only,
    so no false alarms from sketch error."""
    return bool(report.hot_keys(min_share=factor / n_cells))


def main() -> int:
    import json
    import sys
    import tempfile
    import time

    from open_tlm_spark.session import get_spark, load_tables

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("ivf-serving-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, sf_dir)

    emb = spark.table("embeddings")
    seed = emb.filter(F.col("vec_id") % 2 == 0)
    late = sorted(
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.filter(F.col("vec_id") % 2 == 1).collect()
    )

    work = tempfile.mkdtemp(prefix="tlm_ivf_serving_")
    flat, pq = build_serving_indexes(spark, seed, work)
    n_cells = flat.centroids().count()

    landing = os.path.join(work, "landing")
    os.makedirs(landing)
    q, flat, pq = start_dual_intake(
        spark,
        landing,
        work,
        os.path.join(work, "ckpt"),
        compact_every=2,
        trigger_seconds=0.5,
    )
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    try:
        third = max(1, len(late) // 3)
        for i in range(3):
            p = os.path.join(landing, f"batch{i}.json")
            with open(p, "w") as f:
                for vid, vec in late[i * third : (i + 1) * third if i < 2 else len(late)]:
                    f.write(
                        json.dumps({"vec_id": vid, "embedding": vec}) + "\n"
                    )
            mt = time.time() - 60 + i * 10
            os.utime(p, (mt, mt))
        target = emb.count()
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                n = flat.assignments().count()
            except Exception:
                n = -1  # parquet mid-write
            served = serve_topk(flat, pq, queries).count()
            print(f"serving over {n}/{target} vectors ({served} result rows)")
            if n == target:
                break
            time.sleep(2.0)
    finally:
        q.stop()

    report = cell_balance_report(flat)
    print(
        f"cell balance: {len(report.hot_keys(0.25))} cells above 25% share; "
        f"rebuild recommended: {rebuild_recommended(report, n_cells)}"
    )
    out = serve_topk(flat, pq, queries)
    for r in out.orderBy("query_id", "rank").collect():
        print(r)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
