"""A/B: the SQ8 probe's int8-domain dot vs dequantize-in-scan.

VERDICT r10 'What's wrong' #1: the SQ8 serve view multiplied
code x scale / 127 per element per row inside the probe scan — the
measured reason the tier was 14-32% slower in wall time on a
CPU-bound host despite 6.7x fewer bytes. The candidate fix (adopted
in round 11 as `IVFSQ8Index.topk`) quantizes the QUERY side too and
accumulates the dot as integer multiply-adds, rescaling once per
pair:

    cos ~= sum_i(qq8_i * v8_i) * qscale * vscale / 127^2

This harness measures both paths on the same persisted artifact —
`sq8.topk` (the int8-domain override) vs `IVFIndex.topk(sq8, ...)`
(the inherited dequant-view path, called unbound so the override is
bypassed) — warm median-of-5, with recall@10 of each against the
exact flat serve. Round-11 numbers live in SCALE.md; the adoption
rule was the same as every serve-path A/B: win or tie at both
decades at equal recall, else record the rejection.

Usage: python tools/int8_dot_smoke.py [n_vectors ...]  (default 200k)
       (the 20M decade needs SPARK_GRAFT_DRIVER_MEM=64g — the build's
       assign shuffle outgrows the 16g local default at 32 partitions)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tools.ivf_serving_smoke import N_CELLS, synth_vectors


def main() -> int:
    sizes = [int(a) for a in sys.argv[1:]] or [200_000]

    from open_tlm_spark.operators.ivf_store import IVFIndex, IVFSQ8Index
    from open_tlm_spark.session import get_spark

    spark = get_spark("int8-dot-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    print(
        "| n | nprobe | dequant med5 | int8 med5 | dequant recall@10 "
        "| int8 recall@10 |"
    )
    print("|---|---|---|---|---|---|")
    for n in sizes:
        src_path = f"/tmp/sq8_smoke_src_{n}.parquet"
        if not os.path.exists(src_path):
            synth_vectors(spark, n).write.mode("overwrite").parquet(src_path)
        emb = spark.read.parquet(src_path)
        cents = emb.filter(F.col("vec_id") < N_CELLS).select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("cvec"),
        )
        flat_path = f"/tmp/sq8_smoke_flat_{n}"
        sq8_path = f"/tmp/sq8_smoke_sq8_{n}"
        if not IVFIndex(spark, flat_path).exists():
            IVFIndex.build(spark, emb, flat_path, centroids=cents)
        if not IVFSQ8Index(spark, sq8_path).exists():
            IVFSQ8Index.build(spark, emb, sq8_path, centroids=cents)
        flat = IVFIndex(spark, flat_path)
        sq8 = IVFSQ8Index(spark, sq8_path)
        queries = emb.filter(
            (F.col("vec_id") >= N_CELLS) & (F.col("vec_id") < N_CELLS + 8)
        ).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )

        def med5(fn):
            fn()
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                fn()
                ts.append(time.perf_counter() - t0)
            return sorted(ts)[2]

        def ids(df):
            return {(r.query_id, r.vec_id) for r in df.collect()}

        for nprobe in (1, 8):
            truth = ids(flat.topk(queries, k=10, nprobe=nprobe))
            # unbound base-class call = the dequant-view probe
            deq_ids = ids(IVFIndex.topk(sq8, queries, k=10, nprobe=nprobe))
            i8_ids = ids(sq8.topk(queries, k=10, nprobe=nprobe))
            deq_lat = med5(
                lambda: IVFIndex.topk(
                    sq8, queries, k=10, nprobe=nprobe
                ).collect()
            )
            i8_lat = med5(
                lambda: sq8.topk(queries, k=10, nprobe=nprobe).collect()
            )
            print(
                f"| {n:,} | {nprobe} | {deq_lat:.2f} s | {i8_lat:.2f} s | "
                f"{len(truth & deq_ids) / len(truth):.3f} | "
                f"{len(truth & i8_ids) / len(truth):.3f} |"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
