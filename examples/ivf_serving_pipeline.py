"""Continuous ANN serving: intake -> probe -> compact -> serve, live.

End-to-end wiring of the round-8/9/10 serving pieces into one loop
(VERDICT r8 #5) — the vector-side analog of what
`attribution_pipeline.py` does for live==batch analytics:

  1. BUILD both serving artifacts once from the seed corpus: the flat
     IVF index (exact vectors, cell-partitioned) and the IVF+PQ index
     (codes, ~64x smaller raw) sharing the same coarse centroids,
     with a TRAINED per-subspace codebook. Sharing centroids is a
     CONTRACT: it is what lets rerank serving fetch exact vectors by
     (cell, vec_id) and prune the flat scan to the probed cells.
  2. INTAKE embeddings continuously from a landing dir: each
     micro-batch is assigned to its cells and landed in BOTH
     artifacts under one shared epoch — same replay/identity gate as
     `streaming/ivf_intake.py` (monotone epoch counter, checkpoint
     identity pinned, dynamic-overwrite idempotent writes). The sink
     does intake ONLY — no maintenance runs inside foreachBatch
     (VERDICT r9: a compaction there stalls the stream for a table
     rewrite every cadence tick).
  3. MAINTAIN from the serving host's own cadence: `run_maintenance`
     folds accreted (cell, epoch) leaves of both artifacts back to
     epoch 0 once enough intake epochs pile up. Compaction is
     TARGETED (only cells owning intake epochs are rewritten;
     untouched cells hardlink over) and VERSIONED (readers keep
     serving the old version until the atomic pointer flip), and the
     artifact mutation lock serializes it with in-flight adds — the
     stream never observes a half-rewritten table and never stalls
     for one.
  4. PROBE cell balance after intake with the Misra-Gries hot-key
     probe (`operators/preflight.py`): a cell that provably holds an
     outsized share of the corpus is the rebuild signal — and
     `rebuild_and_swap` is the consumer: retrain centroids (and the
     PQ codebook) from the artifact's own vectors into NEW versions
     while the old ones serve, with the pointer flips publishing the
     swap atomically.
  5. SERVE rerank-by-default throughout: ADC top-r candidates from
     the PQ codes, exact cosine re-rank of those r ids against the
     flat artifact (`topk_rerank`) — near-flat recall at code-scan
     cost, and new vectors are servable as soon as their batch lands.
     Serving needs no guard against concurrent mutations: every read
     resolves the version pointer and sees a complete artifact.
     `build_serving_indexes(quantized=True)` swaps the refine
     artifact for the SQ8 int8 tier (~6.7x less disk, ~1e-3 score
     perturbation — SCALE.md) with no other change to this loop.

At 100 TB the loop is the deployment story: the corpus artifacts
outlive every session, intake touches only the cells its vectors land
in, the probe and the compactor are the two maintenance decisions,
and no step ever rescans the corpus. Tested end-to-end by
tests/test_ivf_serving_example.py (streamed dual intake == full
rebuild with maintenance running concurrently, untouched cells
byte-identical across compaction, probe flags a planted hot cell,
rebuild_and_swap preserves the corpus while retraining).
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
    IVFSQ8Index,
    open_vector_index,
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
    quantized: bool = False,
    attrs: DataFrame | None = None,
) -> tuple[IVFIndex, IVFPQIndex]:
    """Both serving artifacts from one seed corpus, sharing coarse
    centroids (train once — the PQ build reuses the flat build's
    centroids so a query routes identically on either path, and so a
    vec_id lives in the SAME cell in both artifacts, which is what
    lets rerank's exact fetch join on (centroid_id, vec_id) and prune
    to the probed cells).

    `quantized=True` builds the refine artifact as the SQ8 int8 tier
    instead of fp64 (~6.7x less disk, ~1e-3 score perturbation —
    SCALE.md round-10 table): IVFSQ8Index is a drop-in IVFIndex, so
    intake, maintenance, probe, rebuild, and serving below all run
    unchanged; `open_vector_index` re-detects the tier on reload.

    `attrs` — optional (vec_id, <attribute columns>) frame for
    FILTERED serving: denormalized into the refine artifact at build
    (`IVFIndex.build(attrs=...)`), after which `topk(where=...)` and
    `topk_rerank(where=...)` filter inside the pruned scan. The PQ
    candidate artifact never carries attributes (m code rows per
    vector); `rebuild_and_swap` reads them back off the serve view,
    so the sidecar survives retraining."""
    flat_cls = IVFSQ8Index if quantized else IVFIndex
    flat = flat_cls.build(
        spark,
        embeddings,
        os.path.join(base_dir, "flat"),
        k=k,
        dim=dim,
        centroids=centroids,
        attrs=attrs,
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
    trigger_seconds: float = 1.0,
):
    """Stream embeddings into BOTH artifacts under one shared epoch
    per micro-batch. One gate file under the base dir covers the pair
    — the two adds share an epoch, and a crash between them replays
    into idempotent dynamic overwrites on both sides. The sink is
    intake-ONLY: compaction belongs to `run_maintenance` on the
    serving host's cadence, never inside foreachBatch.

    This sink feeds attribute-FREE artifacts (the landing schema is
    vec_id + embedding). An index built with `attrs=` refuses an
    attr-less add (fail-fast ValueError in `IVFIndex.add`) rather
    than landing a silently unfilterable epoch — a filtered-serving
    deployment extends the landing schema and passes the attr columns
    through to `add(attrs=...)` in its own sink."""
    flat = open_vector_index(spark, os.path.join(base_dir, "flat"))
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
        identity = _checkpoint_identity(checkpoint_dir, spark)
        gate.check_identity(identity)
        if gate.applied(batch_id):
            return
        epoch = gate.next_epoch()
        stable = batch.localCheckpoint(eager=True)  # one read, two adds
        flat.add(stable, dim=dim, epoch=epoch)
        pq.add(stable, dim=dim, epoch=epoch)
        gate.record(batch_id, epoch + 1, identity)

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    ), flat, pq


def run_maintenance(
    flat: IVFIndex,
    pq: IVFPQIndex,
    max_epochs: int = 4,
    metrics_store=None,
) -> bool:
    """Fold intake epochs once enough accrete — the maintenance tick,
    called from the serving host's own cadence (a monitoring loop, a
    cron), NEVER from the intake sink. The epoch census is a
    partition-leaf listing (no scan); each compaction is targeted
    (only cells owning intake epochs rewrite; the rest hardlink) and
    versioned (serving flips atomically, in-flight readers finish on
    the old version). The artifact mutation lock serializes this with
    the stream's adds, so neither side ever sees the other's partial
    state. Returns True when a compaction ran.

    Pass a `TelemetryStore` as `metrics_store` to publish the serving
    counters (`SERVE_METRICS` — depth-cap hits, thin batches,
    returned rows; VERDICT r12 #5) as `tlm.serve.*` series on the
    same cadence — the maintenance tick is the natural flush point
    on a serving host."""
    if metrics_store is not None:
        import datetime as _dt

        from open_tlm_spark.operators.serve_metrics import SERVE_METRICS

        SERVE_METRICS.flush_to_store(
            metrics_store, _dt.datetime.now(_dt.timezone.utc)
        )
    pending = max(len(flat.intake_epochs()), len(pq.intake_epochs()))
    if pending < max_epochs:
        return False
    flat.compact_epochs()
    pq.compact_epochs()
    return True


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
    artifact — the candidate fetch prunes to the probed cells via the
    (centroid_id, vec_id) join. `nprobe` widens the candidate search
    to more cells and `r` deepens it within them — the two serve-time
    recall knobs."""
    return topk_rerank(pq, flat, queries, k=k, r=r, dim=dim, nprobe=nprobe)


def serve_filtered(
    flat: IVFIndex,
    pq: IVFPQIndex,
    queries: DataFrame,
    where: str,
    variants: dict[str, tuple[IVFIndex, IVFPQIndex]] | None = None,
    k: int = 5,
    r: int = 20,
    nprobe: int = 1,
) -> DataFrame:
    """Filtered serving with VARIANT ROUTING (round 13): if a
    `build_filtered` artifact pair exists for this exact predicate,
    serve from it at default depth — no auto-depth inflation, no
    max_r cap (the variant's corpus IS the filtered corpus; SCALE.md
    r13: full k at 20M where the full artifact caps, 2.1x faster
    than nprobe-widening). Otherwise fall back to the full
    artifact's auto-depth rerank. `variants` maps predicate strings
    to (flat_variant, pq_variant) pairs; each is sanity-checked
    against its recorded `filter_predicate()` so a mislabeled
    artifact cannot silently serve the wrong corpus. The
    `SERVE_METRICS` "rerank.depth_capped_batches" counter is the
    signal for which predicates deserve a variant."""
    pair = (variants or {}).get(where)
    if pair is not None:
        flat_f, pq_f = pair
        recorded = flat_f.filter_predicate()
        if recorded is not None and recorded != where:
            raise ValueError(
                f"variant at {flat_f.path} was built for "
                f"{recorded!r}, not {where!r}"
            )
        return topk_rerank(pq_f, flat_f, queries, k=k, r=r, nprobe=nprobe)
    return topk_rerank(
        pq, flat, queries, k=k, r=r, nprobe=nprobe, where=where
    )


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


def rebuild_and_swap(
    spark: SparkSession,
    flat: IVFIndex,
    pq: IVFPQIndex,
    k: int = 8,
    iters: int = 2,
    dim: int = DIM,
    train_iters: int = 1,
) -> tuple[IVFIndex, IVFPQIndex]:
    """The consumer of `rebuild_recommended` (VERDICT r9 'What's
    missing' #3): retrain the coarse centroids — and the PQ codebook —
    from the artifact's OWN vectors, rebuild both artifacts into new
    versions at the same paths, and let the pointer flips publish each
    swap atomically. The old versions keep serving until their flip
    and survive one further mutation as the reader grace window, so a
    crash anywhere mid-rebuild leaves consistent serving.

    The corpus source is the flat artifact itself (vec_id, nvec — the
    normalized vectors ARE the corpus), read under a READER LEASE
    (`flat.pinned()`, round 12): the rebuild is itself a mutation of
    the flat path, and the PQ rebuild keeps reading the pre-rebuild
    corpus AFTER that flip — previously that read leaned on the
    one-mutation grace window (a concurrent compaction or delete
    landing mid-rebuild would have reclaimed the corpus version
    mid-scan); the lease holds the version until both builds finish,
    and costs nothing (no lock — intake/maintenance proceed, GC just
    keeps one more version until release).
    QUIESCE INTAKE FIRST (stop the stream or let the gate idle): an
    epoch landed between a build's corpus snapshot and its flip would
    not be in the new version — re-land it or replay the landing
    files after the swap. The intake gate's monotone epochs make the
    replay idempotent."""
    with flat.pinned() as snapshot:
        served = snapshot.assignments()
        corpus = served.select("vec_id", F.col("nvec").alias("embedding"))
        # an attrs-built index carries its attribute columns THROUGH
        # the rebuild (ADVICE r10 #1): the serve view exposes them
        # next to each vector, so read them back and hand them to
        # build(attrs=...) — without this the new version would
        # silently drop the sidecar, breaking every topk(where=...)
        # and failing every attr-carrying intake after the swap
        attr_names = snapshot.attr_columns()
        attrs = (
            served.select("vec_id", *attr_names) if attr_names else None
        )
        # type(flat) preserves the precision tier across the rebuild
        # (an SQ8 artifact rebuilds as SQ8; its corpus read is the
        # dequantized view, so retraining sees the ~1e-3-perturbed
        # vectors — the same trade the tier already made at serve
        # time)
        new_flat = type(flat).build(
            spark, corpus, flat.path, k=k, iters=iters, dim=dim,
            attrs=attrs,
        )
        new_pq = IVFPQIndex.build(
            spark,
            corpus,
            pq.path,
            dim=dim,
            centroids=new_flat.centroids(),
            train_iters=train_iters,
        )
    return new_flat, new_pq


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
            # versioned reads need no mid-write guard: the pointer
            # resolves to a complete artifact even during maintenance
            n = flat.assignments().count()
            served = serve_topk(flat, pq, queries).count()
            compacted = run_maintenance(flat, pq, max_epochs=2)
            print(
                f"serving over {n}/{target} vectors ({served} result rows)"
                + (" [compacted]" if compacted else "")
            )
            if n == target:
                break
            time.sleep(2.0)
    finally:
        q.stop()

    report = cell_balance_report(flat)
    recommend = rebuild_recommended(report, n_cells)
    print(
        f"cell balance: {len(report.hot_keys(0.25))} cells above 25% share; "
        f"rebuild recommended: {recommend}"
    )
    if recommend:
        flat, pq = rebuild_and_swap(spark, flat, pq, k=n_cells)
        print("rebuilt and swapped both artifacts")
    out = serve_topk(flat, pq, queries)
    for r in out.orderBy("query_id", "rank").collect():
        print(r)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
