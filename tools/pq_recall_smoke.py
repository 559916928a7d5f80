"""PQ codebook quality vs artifact size, at decade scale (VERDICT r8
#3's measurement half).

Claims under test (operators/ivf_store.py):
  1. Trained per-subspace codebooks (`train_iters > 0`) beat the
     deterministic first-ks convention at the same (m, ks) — by a
     little on isotropic random vectors (nothing to learn: the gate
     corpus is PQ's worst case) and by a lot on CLUSTERED vectors
     (the realistic embedding-corpus shape).
  2. Rerank-by-default serving (`topk_rerank`, ADC top-r + exact
     re-rank of r ids) recovers near-flat recall on BOTH corpus
     shapes at the same compressed artifact size.
  3. The PQ artifact stays ~an order of magnitude smaller on disk
     than the flat artifact at every scale.

Method: synthetic corpora at decade-stepped sizes, two shapes each —
`random` (hash-derived isotropic, the worst case) and `clustered`
(256 well-separated directions + per-vector noise wide enough that
same-cluster neighbors stay distinguishable; near-clone clusters
would make every ADC distance tie and measure nothing). One flat
index per (size, shape) gives ground truth; PQ untrained vs trained
(2 Lloyd iterations) recall@5 over 24 held-in queries, plus rerank
on the trained index with r scaled to the cell size (r=20 is a
gate-scale knob — at |cell| in the thousands the candidate set must
grow with it; the smoke uses max(50, |cell|/50), still a <=2%
vector fetch per query). Artifact bytes from a directory walk.

Usage: python tools/pq_recall_smoke.py [n_vectors ...]
       (default: 1_000_000 10_000_000)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

DIM = 64
N_CELLS = 64
N_CLUSTERS = 256
N_QUERIES = 24


def synth(spark, n: int, shape: str):
    """Deterministic synthetic vectors. `random`: hash-derived
    isotropic components. `clustered`: vec i belongs to cluster
    i % N_CLUSTERS — a hash-derived center direction plus
    hash-derived noise at 0.6 of the center scale, so nearest
    neighbors are overwhelmingly same-cluster but still separable
    within the cluster, and subvector distributions are multi-modal (what a real embedding corpus
    looks like, and what codebook training exploits)."""
    if shape == "random":
        comps = F.array(
            *[
                (
                    F.pmod(F.xxhash64(F.col("id"), F.lit(j)), F.lit(2001))
                    / 1000.0
                    - 1.0
                )
                for j in range(DIM)
            ]
        )
    else:
        cl = F.pmod(F.col("id"), F.lit(N_CLUSTERS))
        comps = F.array(
            *[
                (
                    F.pmod(F.xxhash64(cl, F.lit(j)), F.lit(2001)) / 1000.0
                    - 1.0
                )
                + 0.6
                * (
                    F.pmod(F.xxhash64(F.col("id"), F.lit(j + DIM)), F.lit(2001))
                    / 1000.0
                    - 1.0
                )
                for j in range(DIM)
            ]
        )
    return spark.range(n).select(
        F.col("id").alias("vec_id"), comps.alias("embedding")
    )


def du(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def recall_at5(df, truth) -> float:
    hits = total = 0
    for r in df.collect():
        total += 1
        hits += r.vec_id in truth.get(r.query_id, set())
    return hits / total if total else 0.0


def main() -> int:
    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 10_000_000]

    from open_tlm_spark.operators.ivf_store import (
        IVFIndex,
        IVFPQIndex,
        topk_rerank,
    )
    from open_tlm_spark.session import get_spark

    spark = get_spark("pq-recall-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    print(
        "| n vectors | shape | flat MB | pq MB | recall@5 untrained | "
        "recall@5 trained(2) | rerank (trained) | r | train s |"
    )
    print("|---|---|---|---|---|---|---|---|---|")
    for n in sizes:
        for shape in ("random", "clustered"):
            src = f"/tmp/pq_smoke_{shape}_{n}.parquet"
            synth(spark, n, shape).write.mode("overwrite").parquet(src)
            emb = spark.read.parquet(src)
            cents = emb.filter(F.col("vec_id") < N_CELLS).select(
                F.col("vec_id").alias("centroid_id"),
                F.col("embedding").alias("cvec"),
            )
            base = f"/tmp/pq_smoke_idx_{shape}_{n}"
            flat = IVFIndex.build(
                spark, emb, os.path.join(base, "flat"), centroids=cents
            )
            pq0 = IVFPQIndex.build(
                spark, emb, os.path.join(base, "pq0"), centroids=cents
            )
            t0 = time.time()
            pq2 = IVFPQIndex.build(
                spark,
                emb,
                os.path.join(base, "pq2"),
                centroids=cents,
                train_iters=2,
            )
            train_s = time.time() - t0

            queries = emb.filter(
                (F.col("vec_id") >= N_CELLS)
                & (F.col("vec_id") < N_CELLS + N_QUERIES)
            ).select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec"),
            )
            truth = {}
            for r in flat.topk(queries, k=5).collect():
                truth.setdefault(r.query_id, set()).add(r.vec_id)
            r_base = recall_at5(pq0.topk(queries, k=5), truth)
            r_tr = recall_at5(pq2.topk(queries, k=5), truth)
            # candidate depth scales with the cell: a fixed r=20 was
            # tuned at gate scale (|cell| ~ 60); keep the fetch <= 2%
            # of the average cell as the corpus grows
            r_depth = max(50, n // N_CELLS // 50)
            r_rr = recall_at5(
                topk_rerank(pq2, flat, queries, k=5, r=r_depth), truth
            )
            flat_mb = du(os.path.join(base, "flat", "assignments")) / 1e6
            pq_mb = (
                du(os.path.join(base, "pq2", "pq_codes"))
                + du(os.path.join(base, "pq2", "pq_codebook"))
            ) / 1e6
            print(
                f"| {n:,} | {shape} | {flat_mb:,.0f} | {pq_mb:,.0f} | "
                f"{r_base:.2f} | {r_tr:.2f} | {r_rr:.2f} | {r_depth} | "
                f"{train_s:,.0f} |",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
