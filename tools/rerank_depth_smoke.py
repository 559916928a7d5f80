"""Filtered-rerank depth automation smoke: starvation vs auto depth.

Claim under test (operators/ivf_store.py::topk_rerank, round 11 —
VERDICT r10 'What's missing' #3): the ADC candidate stage is
unfiltered (PQ codes carry no attributes), so under a selective
predicate the filtered survivors of r candidates starve below k.
With `auto_depth=True` (the default) r is divided by the estimated
selectivity — one memoized narrow scan per (artifact state,
predicate) — so default arguments return the full k.

Measured here: rows returned per query and wall time (warm med5) for
manual r=50 vs auto depth, across selectivities 1/64 and 1/1024 on
200k synthetic vectors (attribute bucket = vec_id % M, filter
bucket = 0), plus the one-off selectivity-estimate cost. Ground
truth = brute force over the filtered corpus.

Second section (round 12 — VERDICT r11 'What's missing' #3): a
GEOMETRY-CORRELATED attribute. `bucket = vec_id % M` is independent
of cell geometry by construction, so the r11 GLOBAL estimate
happened to be right; here the attribute is a function of the cell
(hit = 1 everywhere except one target cell, where only 32 vectors
carry it), so the global fraction (~0.99) says depth is fine while
the target cell is ~99% matchless. Compared: the r11 global rule
(simulated via auto_depth=False at r = ceil(50/global_sel)) vs the
round-12 per-query min-probed-cell rule, on the query batch probing
the starved cell — rows/q, recall vs brute force over the filtered
corpus, warm med5, and the one-off per-cell estimate cost.

Usage: python tools/rerank_depth_smoke.py [n_vectors]  (default 200k)
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
    corr_only = len(sys.argv) > 2 and sys.argv[2] == "corr-only"

    from open_tlm_spark.operators.ivf_store import (
        IVFIndex,
        IVFPQIndex,
        topk_rerank,
    )
    from open_tlm_spark.operators.similarity import brute_force_topk
    from open_tlm_spark.session import get_spark

    spark = get_spark("rerank-depth-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    src_path = f"/tmp/fann_smoke_src_{n}.parquet"
    if not os.path.exists(src_path):
        synth_vectors(spark, n).write.mode("overwrite").parquet(src_path)
    emb = spark.read.parquet(src_path)
    cents = emb.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("cvec"),
    )
    queries = emb.filter(
        (F.col("vec_id") >= N_CELLS) & (F.col("vec_id") < N_CELLS + 16)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    nq = queries.count()

    def med5(fn):
        fn()
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[2]

    print(
        "| selectivity | manual r=50 rows/q | auto rows/q | auto r_eff | "
        "est. cost (one-off) | manual med5 | auto med5 | auto recall@10 |"
    )
    print("|---|---|---|---|---|---|---|---|")
    for m in () if corr_only else (64, 1024):
        attrs = emb.select("vec_id", (F.col("vec_id") % m).alias("bucket"))
        flat = IVFIndex.build(
            spark,
            emb,
            f"/tmp/rds_flat_{n}_{m}",
            centroids=cents,
            attrs=attrs,
        )
        pq = IVFPQIndex.build(
            spark, emb, f"/tmp/rds_pq_{n}_{m}", centroids=cents
        )
        where = "bucket = 0"

        t0 = time.perf_counter()
        sel = flat.estimate_filter_selectivity(where)
        est_cost = time.perf_counter() - t0
        r_eff = int(round(50 / sel))

        truth = {}
        for r in brute_force_topk(
            emb.filter(F.col("vec_id") % m == 0), queries, k=10
        ).collect():
            truth.setdefault(r.query_id, set()).add(r.vec_id)

        def run(auto):
            return topk_rerank(
                pq, flat, queries, k=10, r=50, nprobe=8,
                where=where, auto_depth=auto,
            )

        manual_rows = run(False).count() / nq
        auto_out = run(True).collect()
        auto_rows = len(auto_out) / nq
        hits = sum(
            1 for r in auto_out if r.vec_id in truth.get(r.query_id, set())
        )
        recall = hits / max(len(auto_out), 1)

        manual_lat = med5(lambda: run(False).collect())
        auto_lat = med5(lambda: run(True).collect())
        print(
            f"| 1/{m} | {manual_rows:.1f} | {auto_rows:.1f} | {r_eff:,} | "
            f"{est_cost * 1000:.0f} ms | {manual_lat:.2f} s | "
            f"{auto_lat:.2f} s | {recall:.3f} |"
        )

    # ------------- round 12: geometry-correlated attribute section
    import math

    from open_tlm_spark.operators.similarity import ivf_assign_slim

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
        spark, emb, f"/tmp/rds_corr_flat_{n}", centroids=cents, attrs=attrs
    )
    pq = IVFPQIndex.build(
        spark, emb, f"/tmp/rds_corr_pq_{n}", centroids=cents
    )
    where = "hit = 1"
    # the batch is the queries whose nprobe=1 cell IS the starved cell
    # (query N_CELLS routes there by construction; its cellmates too —
    # a 2*N_CELLS-wide id range yields a handful of them)
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
    nqc = qcorr.count()
    t0 = time.perf_counter()
    by_cell = flat.estimate_filter_selectivity_by_cell(where)
    cell_est_cost = time.perf_counter() - t0
    global_sel = flat.estimate_filter_selectivity(where)  # memo hit
    r_global = math.ceil(50 / global_sel)

    # truth = the probed cell's filtered rows (what nprobe=1 CAN
    # return): this measures depth correctness, not nprobe geometry —
    # the GLOBAL filtered top-10 live in other cells by construction
    # here, which is the standard nprobe recall trade, not a depth
    # defect
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

    def run_corr(auto, r):
        return topk_rerank(
            pq, flat, qcorr, k=10, r=r, nprobe=1,
            where=where, auto_depth=auto,
        )

    global_rows = run_corr(False, r_global).count() / nqc
    out = run_corr(True, 50).collect()
    auto_rows = len(out) / nqc
    hits = sum(1 for r in out if r.vec_id in truth.get(r.query_id, set()))
    recall = hits / max(len(out), 1)
    global_lat = med5(lambda: run_corr(False, r_global).collect())
    auto_lat = med5(lambda: run_corr(True, 50).collect())
    print()
    print(
        "correlated attr (hit=1 except 32 rows in the probed cell; "
        f"{nqc} queries probing it, nprobe=1):"
    )
    print(
        "| rule | rows/q (k=10) | med5 | cell sel (probed) | global sel | "
        "est cost |"
    )
    print("|---|---|---|---|---|---|")
    print(
        f"| r11 global (r={r_global}) | {global_rows:.1f} | "
        f"{global_lat:.2f} s | {by_cell[c0]:.4f} | {global_sel:.4f} | — |"
    )
    print(
        f"| r12 per-cell min (r=50) | {auto_rows:.1f} | {auto_lat:.2f} s | "
        f"{by_cell[c0]:.4f} | {global_sel:.4f} | {cell_est_cost*1000:.0f} ms |"
    )
    print(f"| recall@10 vs filtered brute force (per-cell rule) | {recall:.3f} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
