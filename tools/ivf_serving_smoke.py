"""IVF serving decade smoke: probe cost vs corpus size, flat vs PQ.

Claims under test (operators/ivf_store.py):
  1. A probe reads 1/n_cells of the corpus via dynamic partition
     pruning — per-query latency should track CELL size, not corpus
     size, and the scan's PartitionFilters carries the cell subquery.
  2. The PQ artifact is an order of magnitude smaller ON DISK than
     the flat one (raw math says 64x at dim=64 float64 vs m=8 codes;
     parquet compression narrows it — measured ~17x), which is the
     100 TB reason the ADC path exists.

Method: synthetic unit vectors at decade-stepped corpus sizes, one
index build per size (64 cells — build cost reported but not the
claim), then median-of-5 warm probe latencies for a 4-query batch on
the flat and PQ paths, plus artifact sizes on disk.

Usage: python tools/ivf_serving_smoke.py [n_vectors ...]
       (default: 200_000 2_000_000)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

DIM = 64
N_CELLS = 64


def synth_vectors(spark, n: int):
    """Deterministic pseudo-random dense vectors (hash-derived,
    roughly isotropic); normalized downstream by the index build."""
    comps = F.array(
        *[
            (
                F.pmod(F.xxhash64(F.col("id"), F.lit(j)), F.lit(2001)) / 1000.0
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


def main() -> int:
    sizes = [int(a) for a in sys.argv[1:]] or [200_000, 2_000_000]

    from open_tlm_spark.operators.ivf_store import IVFIndex, IVFPQIndex
    from open_tlm_spark.session import get_spark

    spark = get_spark("ivf-serving-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    print("| n vectors | flat probe (med of 5) | pq probe (med of 5) | "
          "flat artifact | pq artifact |")
    print("|---|---|---|---|---|")
    for n in sizes:
        src_path = f"/tmp/ivf_smoke_src_{n}.parquet"
        synth_vectors(spark, n).write.mode("overwrite").parquet(src_path)
        emb = spark.read.parquet(src_path)
        cents = emb.filter(F.col("vec_id") < N_CELLS).select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("cvec"),
        )
        flat = IVFIndex.build(
            spark, emb, f"/tmp/ivf_smoke_flat_{n}", centroids=cents
        )
        pq = IVFPQIndex.build(
            spark, emb, f"/tmp/ivf_smoke_pq_{n}", centroids=cents
        )
        queries = emb.filter(
            (F.col("vec_id") >= N_CELLS) & (F.col("vec_id") < N_CELLS + 4)
        ).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )

        def med5(idx):
            idx.topk(queries, k=10).collect()  # warm
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                idx.topk(queries, k=10).collect()
                ts.append(time.perf_counter() - t0)
            return sorted(ts)[2]

        f_lat, p_lat = med5(flat), med5(pq)
        f_sz = du(flat.data_path)
        p_sz = du(pq.codes_path) + du(pq.codebook_path)
        print(
            f"| {n:,} | {f_lat:.2f} s | {p_lat:.2f} s | "
            f"{f_sz / 1e6:,.0f} MB | {p_sz / 1e6:,.0f} MB |"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
