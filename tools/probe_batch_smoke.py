"""Probe batch-size smoke: where partition pruning saturates, and
what IVF still buys past that point.

A single probe reads nprobe/n_cells of the corpus via dynamic
partition pruning. A BATCH of queries probes the union of their
cells: expected distinct cells follows the coupon collector,
n_cells x (1 - (1 - 1/n_cells)^batch), so past batch ~ n_cells x
ln(n_cells) the scan covers every cell and pruning stops paying —
but the probe is an EQUI-JOIN on the cell id, so each corpus row
still scores only against its own cell's queries: compute stays
|corpus| x batch / n_cells, an n_cells-fold win over brute force at
ANY batch size. This smoke measures both effects: wall time per
batch size (scan saturates, throughput keeps rising because the one
scan amortizes) and queries/s vs the brute-force join at the same
batch.

Usage: python tools/probe_batch_smoke.py [n_vectors]  (default 200_000)
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

    from open_tlm_spark.operators.ivf_store import IVFIndex
    from open_tlm_spark.operators.similarity import brute_force_topk
    from open_tlm_spark.session import get_spark

    spark = get_spark("probe-batch-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    src_path = f"/tmp/pbatch_smoke_src_{n}.parquet"
    synth_vectors(spark, n).write.mode("overwrite").parquet(src_path)
    emb = spark.read.parquet(src_path)
    cents = emb.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("cvec"),
    )
    idx = IVFIndex.build(
        spark, emb, f"/tmp/pbatch_smoke_idx_{n}", centroids=cents
    )

    def med3(fn):
        fn()  # warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[1]

    print(
        f"n={n:,}, {N_CELLS} cells; expected distinct probed cells = "
        f"{N_CELLS} x (1 - (1 - 1/{N_CELLS})^batch)"
    )
    print(
        "| batch | E[cells] | ivf probe (med3) | ivf q/s | "
        "brute (med3) | brute q/s |"
    )
    print("|---|---|---|---|---|---|")
    for batch in (4, 32, 256, 2048):
        queries = emb.filter(
            (F.col("vec_id") >= N_CELLS)
            & (F.col("vec_id") < N_CELLS + batch)
        ).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        e_cells = N_CELLS * (1 - (1 - 1 / N_CELLS) ** batch)
        t_ivf = med3(lambda: idx.topk(queries, k=10).collect())
        t_bf = med3(lambda: brute_force_topk(emb, queries, k=10).collect())
        print(
            f"| {batch} | {e_cells:.0f} | {t_ivf:.2f} s | "
            f"{batch / t_ivf:,.0f} | {t_bf:.2f} s | {batch / t_bf:,.0f} |"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
