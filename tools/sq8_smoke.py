"""SQ8 tier smoke: artifact bytes + probe cost + recall vs the flat
fp64 artifact, and the rerank fetch served from SQ8 instead of fp64.

Claims under test (operators/ivf_store.py::IVFSQ8Index):
  1. The int8 artifact is a small fraction of the fp64 one on disk
     (raw math: 64 B codes + 8 B scale vs 512 B of doubles per row;
     parquet dictionary-encodes the 255-value code alphabet).
  2. Ranking error from quantization is negligible: recall@10 vs the
     exact flat serve stays >= 0.95 at corpus scale.
  3. `topk_rerank(pq, sq8)` — the refine fetch reading int8 rows —
     keeps the fp64-refined result set while fetching ~1/8 the bytes.

Usage: python tools/sq8_smoke.py [n_vectors ...]   (default: 200_000)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tools.ivf_serving_smoke import N_CELLS, du, synth_vectors


def main() -> int:
    sizes = [int(a) for a in sys.argv[1:]] or [200_000]

    from open_tlm_spark.operators.ivf_store import (
        IVFIndex,
        IVFPQIndex,
        IVFSQ8Index,
        topk_rerank,
    )
    from open_tlm_spark.session import get_spark

    spark = get_spark("sq8-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    print(
        "| n vectors | flat MB | sq8 MB | ratio | sq8 probe (med5) | "
        "flat probe (med5) | sq8 recall@10 | rerank-sq8 vs rerank-fp64 "
        "overlap@10 | rerank-sq8 (med5) | rerank-fp64 (med5) |"
    )
    print("|---|---|---|---|---|---|---|---|---|---|")
    for n in sizes:
        src_path = f"/tmp/sq8_smoke_src_{n}.parquet"
        synth_vectors(spark, n).write.mode("overwrite").parquet(src_path)
        emb = spark.read.parquet(src_path)
        cents = emb.filter(F.col("vec_id") < N_CELLS).select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("cvec"),
        )
        flat = IVFIndex.build(
            spark, emb, f"/tmp/sq8_smoke_flat_{n}", centroids=cents
        )
        sq8 = IVFSQ8Index.build(
            spark, emb, f"/tmp/sq8_smoke_sq8_{n}", centroids=cents
        )
        pq = IVFPQIndex.build(
            spark, emb, f"/tmp/sq8_smoke_pq_{n}", centroids=cents
        )
        queries = emb.filter(
            (F.col("vec_id") >= N_CELLS) & (F.col("vec_id") < N_CELLS + 8)
        ).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )

        def med5(fn):
            fn()  # warm
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                fn()
                ts.append(time.perf_counter() - t0)
            return sorted(ts)[2]

        def ids(df):
            return {(r.query_id, r.vec_id) for r in df.collect()}

        f_ids = ids(flat.topk(queries, k=10))
        s_ids = ids(sq8.topk(queries, k=10))
        recall = len(f_ids & s_ids) / len(f_ids)

        r = max(50, (n // N_CELLS) // 50)  # the SCALE.md rerank depth rule
        rr_flat = ids(topk_rerank(pq, flat, queries, k=10, r=r))
        rr_sq8 = ids(topk_rerank(pq, sq8, queries, k=10, r=r))
        rr_overlap = len(rr_flat & rr_sq8) / len(rr_flat)

        s_lat = med5(lambda: sq8.topk(queries, k=10).collect())
        f_lat = med5(lambda: flat.topk(queries, k=10).collect())
        rrs_lat = med5(
            lambda: topk_rerank(pq, sq8, queries, k=10, r=r).collect()
        )
        rrf_lat = med5(
            lambda: topk_rerank(pq, flat, queries, k=10, r=r).collect()
        )

        f_sz = du(flat.data_path)
        s_sz = du(sq8.data_path)
        print(
            f"| {n:,} | {f_sz / 1e6:,.0f} | {s_sz / 1e6:,.0f} | "
            f"{f_sz / s_sz:.1f}x | {s_lat:.2f} s | {f_lat:.2f} s | "
            f"{recall:.3f} | {rr_overlap:.3f} (r={r}) | "
            f"{rrs_lat:.2f} s | {rrf_lat:.2f} s |"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
