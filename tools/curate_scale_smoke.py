"""Per-stage scale smoke for the curation pipeline
(examples/curate_corpus.py) at decade-stepped corpus sizes.

VERDICT r6 #7: the funnel's shared-scan claim is plan-pinned
(tests/test_plan_quality.py::test_funnel_single_corpus_scan...); this
tool publishes the MEASURED per-stage wall time and shuffle volume of
the real composed pipeline — the numbers that show which stage owns
the cost at scale and that nothing superlinear hides between stage
boundaries.

Method: synthesize N docs JVM-side (synth_docs_wide below — the dedup
smoke's planted-dup corpus shape over a sparse 10k-word vocabulary),
write to parquet so synthesis stays out of the measured phases, then
materialize each
stage frame of curate_stages() in order. Stage wall = cumulative run
minus the previous stages' cumulative (each stage frame recomputes its
lineage — the pipeline is ONE lazy program, so stage boundaries do not
checkpoint); shuffle bytes come from the Spark status store diffed
around each materialization.

Usage: python tools/curate_scale_smoke.py [n_docs ...]
       (default: 200_000 2_000_000)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def synth_docs_wide(spark, n: int, vocab_size: int = 10_000):
    """Same planted-dup corpus shape as
    tools/corpus_scale_smoke.synth_docs, but over a 10k-word
    vocabulary: the dedup smoke's 100-word vocab saturates the 3-gram
    shingle space at millions of docs, which makes the
    DECONTAMINATION stage degenerate (the benchmark slice covers
    nearly every shingle, so contam_frac -> 1 corpus-wide — measured:
    2M docs shrank to 1.6k at the clean stage). A realistic sparse
    shingle space keeps every stage's selectivity meaningful."""
    base = F.when(
        F.col("id") % 50 == 0, F.col("id") % 1000
    ).otherwise(F.col("id"))
    words = F.transform(
        F.sequence(F.lit(1), F.lit(60)),
        lambda j: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(base, j), vocab_size).cast("string"),
        ),
    )
    return spark.range(
        n, numPartitions=spark.sparkContext.defaultParallelism
    ).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", words).alias("text"),
    )


def _shuffle_totals(spark) -> tuple[int, int]:
    """(write_bytes, read_bytes) across all stages so far, from the
    app status store (the UI's numbers, no listener plumbing)."""
    store = spark._jsparkSession.sparkContext().statusStore()
    jvm = spark.sparkContext._jvm
    gw = spark.sparkContext._gateway
    stages = store.stageList(
        jvm.java.util.ArrayList(),
        False,
        False,
        gw.new_array(jvm.double, 0),
        jvm.java.util.ArrayList(),
    )
    n = stages.size()
    w = sum(stages.apply(i).shuffleWriteBytes() for i in range(n))
    r = sum(stages.apply(i).shuffleReadBytes() for i in range(n))
    return w, r


def main() -> int:
    sizes = [int(a) for a in sys.argv[1:]] or [200_000, 2_000_000]

    from examples.curate_corpus import curate_stages
    from open_tlm_spark.session import get_spark

    spark = get_spark("curate-scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    for n in sizes:
        path = f"/tmp/curate_smoke_{n}.parquet"
        (
            synth_docs_wide(spark, n)
            .select(
                "doc_id",
                "text",
                F.lit("en").alias("lang"),
                F.concat(
                    F.lit("src"), (F.col("doc_id") % 20).cast("string")
                ).alias("source"),
            )
            .write.mode("overwrite")
            .parquet(path)
        )
        docs = spark.read.parquet(path)

        print(f"\n## {n:,} docs")
        # the CC convergence loop runs its iterations while the plan
        # is BUILT (checkpointed rounds) — time it separately so the
        # stage rows measure materialization, not iteration
        wb0, rb0 = _shuffle_totals(spark)
        t0 = time.perf_counter()
        stages = curate_stages(spark, "", docs=docs)
        build_s = time.perf_counter() - t0
        wb1, rb1 = _shuffle_totals(spark)
        print(
            f"plan build incl. CC iterations: {build_s:.1f} s, "
            f"shuffle {(wb1 - wb0) / 1e6:,.1f} MB written"
        )
        print("| stage | rows out | lineage wall | marginal | "
              "stage shuffle write | stage shuffle read |")
        print("|---|---|---|---|---|---|")
        prev_wall = 0.0
        for stage, frame in stages.items():
            w0, r0 = _shuffle_totals(spark)
            t0 = time.perf_counter()
            rows = frame.count()
            wall = time.perf_counter() - t0
            w1, r1 = _shuffle_totals(spark)
            print(
                f"| {stage} | {rows:,} | {wall:.1f} s "
                f"| {wall - prev_wall:+.1f} s | {(w1 - w0) / 1e6:,.1f} MB "
                f"| {(r1 - r0) / 1e6:,.1f} MB |"
            )
            prev_wall = wall
    return 0


if __name__ == "__main__":
    sys.exit(main())
