"""Dedicated filtered-index variant vs nprobe-widening at the cap.

Claim under test (operators/ivf_store.py::IVFIndex.build_filtered,
round 13 — VERDICT r12 "Next round" #4): at the max_r horizon the
depth-cap warning names three recoveries — raise max_r, widen
nprobe, or serve the predicate from a dedicated index. Round 12
verified the nprobe knob (nprobe=2 restores full k at 20M); this
smoke gives the third branch its measured A/B.

Setup replicates the r12 geometry-correlated cap scenario
(tools/rerank_depth_smoke.py): `hit = 1` everywhere EXCEPT the
probed cell, where only 32 rows carry it — at 20M the per-cell
depth rule honestly caps (want ~488k candidates/query > max_r
65,536) and returns ~5/10 rows. Compared on the same corpus, k=10,
the starved-cell query batch, warm med5:

  A. full artifact, defaults (nprobe=1)        — the capped baseline
  B. full artifact, nprobe=2                   — the widening knob
  C. build_filtered variant pair, defaults     — this round's branch
     (one-off build cost reported; serving carries NO predicate, so
     no depth inflation and no cap by construction)

Variant recall is scored against the in-cell filtered truth (same
convention as the r12 smoke: cross-cell recall is the standard
nprobe trade, not a depth property).

Usage: python tools/filtered_variant_smoke.py [n_vectors]
       (default 200k; 20M needs SPARK_GRAFT_DRIVER_MEM=64g)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tools.ivf_serving_smoke import N_CELLS, synth_vectors


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000

    from open_tlm_spark.operators.ivf_store import (
        IVFIndex,
        IVFPQIndex,
        topk_rerank,
    )
    from open_tlm_spark.operators.similarity import (
        brute_force_topk,
        ivf_assign_slim,
    )
    from open_tlm_spark.session import get_spark

    spark = get_spark("filtered-variant-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    src_path = f"/tmp/fann_smoke_src_{n}.parquet"
    if not os.path.exists(src_path):
        synth_vectors(spark, n).write.mode("overwrite").parquet(src_path)
    emb = spark.read.parquet(src_path)
    cents = emb.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("cvec"),
    )

    # --- the r12 correlated-attribute scenario, verbatim
    assign = ivf_assign_slim(emb, cents).select("vec_id", "centroid_id")
    c0 = int(
        assign.filter(F.col("vec_id") == N_CELLS).first().centroid_id
    )
    hit_ids = [
        int(r.vec_id)
        for r in assign.filter(
            (F.col("centroid_id") == c0) & (F.col("vec_id") >= 2 * N_CELLS)
        )
        .orderBy("vec_id")
        .limit(32)
        .collect()
    ]
    attrs = assign.select(
        "vec_id",
        F.when(
            (F.col("centroid_id") != c0) | F.col("vec_id").isin(hit_ids), 1
        )
        .otherwise(0)
        .alias("hit"),
    )
    flat = IVFIndex.build(
        spark, emb, f"/tmp/fvs_flat_{n}", centroids=cents, attrs=attrs
    )
    pq = IVFPQIndex.build(spark, emb, f"/tmp/fvs_pq_{n}", centroids=cents)
    where = "hit = 1"
    qcorr = (
        assign.filter(
            (F.col("centroid_id") == c0)
            & (F.col("vec_id") >= N_CELLS)
            & (F.col("vec_id") < N_CELLS + 8 * N_CELLS)
        )
        .join(emb, "vec_id")
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )
    nq = qcorr.count()

    # in-cell filtered truth (the r12 convention)
    truth = {}
    for r in brute_force_topk(
        emb.join(
            attrs.filter(F.col("hit") == 1).select("vec_id"), "vec_id"
        ).join(
            assign.filter(F.col("centroid_id") == c0).select("vec_id"),
            "vec_id",
        ),
        qcorr,
        k=10,
    ).collect():
        truth.setdefault(r.query_id, set()).add(r.vec_id)

    def med5(fn):
        fn()
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[2]

    def score(rows):
        hits = sum(
            1 for r in rows if r.vec_id in truth.get(r.query_id, set())
        )
        return len(rows) / nq, hits / max(len(rows), 1)

    # A. full artifact, defaults (the capped baseline at 20M)
    run_a = lambda: topk_rerank(  # noqa: E731
        pq, flat, qcorr, k=10, nprobe=1, where=where
    )
    rows_a, rec_a = score(run_a().collect())
    lat_a = med5(lambda: run_a().collect())

    # B. full artifact, nprobe=2 (the widening knob)
    run_b = lambda: topk_rerank(  # noqa: E731
        pq, flat, qcorr, k=10, nprobe=2, where=where
    )
    rows_b, _ = score(run_b().collect())
    lat_b = med5(lambda: run_b().collect())

    # C. dedicated variant pair at defaults — build cost is the
    # one-off price of the branch
    t0 = time.perf_counter()
    flat_f = flat.build_filtered(f"/tmp/fvs_flat_f_{n}", where)
    pq_f = flat.build_filtered(
        f"/tmp/fvs_pq_f_{n}", where, cls=IVFPQIndex
    )
    build_cost = time.perf_counter() - t0
    run_c = lambda: topk_rerank(pq_f, flat_f, qcorr, k=10, nprobe=1)  # noqa: E731
    rows_c, rec_c = score(run_c().collect())
    lat_c = med5(lambda: run_c().collect())

    print(
        f"\n{n:,} vectors, {nq} queries probing the starved cell "
        f"(cell {c0}, 32 matching rows), k=10, warm med5:"
    )
    print(
        "| strategy | rows/q | med5 | recall@10 (in-cell) | one-off |"
    )
    print("|---|---|---|---|---|")
    print(
        f"| A. full artifact, defaults | {rows_a:.1f} | {lat_a:.2f} s | "
        f"{rec_a:.3f} | — |"
    )
    print(
        f"| B. full artifact, nprobe=2 | {rows_b:.1f} | {lat_b:.2f} s | "
        f"(cross-cell) | — |"
    )
    print(
        f"| C. build_filtered variant, defaults | {rows_c:.1f} | "
        f"{lat_c:.2f} s | {rec_c:.3f} | build {build_cost:.1f} s |"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
