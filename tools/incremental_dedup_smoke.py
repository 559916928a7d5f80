"""Continuous-intake dedup smoke: per-batch cost as the band store
grows (streaming/incremental_dedup.py at decade scale).

The 100 TB claim under test: a document's storage cost in the dedup
path is its BAND ROWS (4 x ~40 B), so the per-batch probe — an
equi-join of the micro-batch's bands against the accumulated store —
re-reads only the band table, never old text. Per-batch wall should
therefore grow with the (tiny) band store, not with the corpus, and
the cumulative incremental cost should beat re-running batch dedup
from scratch on every intake (the quadratic a pipeline without an
incremental path pays).

Method: synth docs with planted dups (the curate smoke's sparse-vocab
shape), slice into E epochs of B docs, process_batch each epoch, and
record wall + stored band rows at sampled epochs. Then one full-batch
dedup over the same corpus for the endgame comparison.

Usage: python tools/incremental_dedup_smoke.py [batch_docs] [epochs]
       (default: 20000 docs x 25 epochs = 500k docs)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tools.curate_scale_smoke import synth_docs_wide


def main() -> int:
    batch_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 25

    from open_tlm_spark.session import get_spark
    from open_tlm_spark.streaming.incremental_dedup import IncrementalDeduper

    spark = get_spark("incremental-dedup-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    n = batch_docs * epochs
    corpus_path = f"/tmp/incdedup_smoke_{n}.parquet"
    (
        synth_docs_wide(spark, n)
        .select("doc_id", "text")
        .write.mode("overwrite")
        .parquet(corpus_path)
    )
    docs = spark.read.parquet(corpus_path)

    store_dir = tempfile.mkdtemp(prefix="incdedup_store_")
    dedup = IncrementalDeduper(spark, store_dir)

    sample_at = {1, epochs // 5, epochs // 2, 3 * epochs // 4, epochs}
    print(
        f"## Incremental dedup: {epochs} epochs x {batch_docs:,} docs "
        f"({n:,} total)"
    )
    print("| epoch | docs seen | stored band rows | batch wall |")
    print("|---|---|---|---|")
    total_incremental = 0.0
    for e in range(1, epochs + 1):
        lo, hi = (e - 1) * batch_docs, e * batch_docs
        batch = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        t0 = time.perf_counter()
        dedup.process_batch(batch, epoch=e - 1)
        wall = time.perf_counter() - t0
        total_incremental += wall
        if e in sample_at:
            bands = dedup._stored_bands().count()
            print(f"| {e} | {e * batch_docs:,} | {bands:,} | {wall:.1f} s |")

    n_flags = dedup.flags().count()
    print(f"\nincremental: {total_incremental:.1f} s total, {n_flags:,} flags")

    # endgame comparison: one full-batch dedup over the same corpus
    # (what a pipeline WITHOUT the incremental path re-runs per intake)
    from open_tlm_spark.operators import dedup as D

    t0 = time.perf_counter()
    sh = D.shingle_table(docs)
    sig = D.minhash_signatures(sh)
    cand = D.lsh_candidates(sig)
    n_cand_docs = (
        cand.select(F.col("doc_b").alias("doc_id")).distinct().count()
    )
    batch_wall = time.perf_counter() - t0
    print(
        f"full-batch dedup of the same corpus: {batch_wall:.1f} s for ONE "
        f"run ({n_cand_docs:,} flagged docs); a pipeline re-running batch "
        f"dedup on each of the {epochs} intakes would pay this on a "
        f"GROWING corpus every time — the incremental path paid "
        f"{total_incremental / epochs:.1f} s/intake against bands only."
    )
    shutil.rmtree(store_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
