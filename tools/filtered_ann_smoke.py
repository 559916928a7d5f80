"""Filtered-ANN recall smoke: nprobe vs filter selectivity.

Claim under test (operators/ivf_store.py::IVFIndex.topk(where=...)):
pre-filter semantics mean a selective predicate thins each probed
cell's candidate pool, so recall against the filtered brute-force
truth is recovered by probing MORE cells — `nprobe` is the same
recall knob as unfiltered, and the docstring's guidance ("under a
highly selective filter, raise nprobe") should be visible as a
recall surface, not folklore.

Method: synthetic unit vectors with a synthetic attribute
`bucket = vec_id % M` persisted in the artifact (selectivity 1/M by
construction), recall@10 of `topk(where="bucket = 0", nprobe=p)`
against brute force over the bucket-0 corpus, for a selectivity x
nprobe grid. Also reports the filtered probe's wall time at
nprobe=1 vs the unfiltered probe (the pushed predicate makes the
filtered scan CHEAPER, not costlier — same pruned files, fewer rows
surviving the row-group scan).

Usage: python tools/filtered_ann_smoke.py [n_vectors]  (default 200_000)
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

    spark = get_spark("filtered-ann-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    src_path = f"/tmp/fann_smoke_src_{n}.parquet"
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

    selectivities = [4, 64, 1024]  # bucket = vec_id % M, filter bucket = 0
    attrs = emb.select(
        "vec_id",
        *[
            (F.col("vec_id") % m).cast("int").alias(f"b{m}")
            for m in selectivities
        ],
    )
    idx = IVFIndex.build(
        spark, emb, f"/tmp/fann_smoke_idx_{n}", centroids=cents, attrs=attrs
    )

    print(f"recall@10 vs filtered brute force, n={n:,}, {N_CELLS} cells:")
    print("| selectivity | nprobe=1 | nprobe=2 | nprobe=4 | nprobe=8 | nprobe=16 |")
    print("|---|---|---|---|---|---|")
    for m in selectivities:
        truth = {}
        for r in brute_force_topk(
            emb.join(attrs.filter(F.col(f"b{m}") == 0), "vec_id").select(
                "vec_id", "embedding"
            ),
            queries,
            k=10,
        ).collect():
            truth.setdefault(r.query_id, set()).add(r.vec_id)
        n_q = queries.count()
        cells = []
        for p in (1, 2, 4, 8, 16):
            hits = total = 0
            got = idx.topk(
                queries, k=10, nprobe=p, where=f"b{m} = 0"
            ).collect()
            for r in got:
                total += 1
                hits += r.vec_id in truth.get(r.query_id, set())
            # report recall against truth AND returned-row starvation:
            # pre-filter semantics return fewer than k rows when the
            # probed cells hold fewer than k filtered matches
            cells.append(
                f"{hits / max(total, 1):.3f} ({total / n_q:.1f}/q)"
            )
        print(f"| 1/{m} | " + " | ".join(cells) + " |")

    def med5(fn):
        fn()
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[2]

    t_unf = med5(lambda: idx.topk(queries, k=10).collect())
    t_fil = med5(
        lambda: idx.topk(queries, k=10, where="b64 = 0").collect()
    )
    print(
        f"probe wall (med5, nprobe=1): unfiltered {t_unf:.2f} s, "
        f"filtered 1/64 {t_fil:.2f} s"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
