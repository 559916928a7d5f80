"""Corpus-scale smoke for the dedup pipeline: synthesize N documents
JVM-side (no Python in the data path), run the full
shingle -> MinHash -> LSH-band -> star-edge -> connected-components
clustering at a decade-stepped corpus size, and report wall times +
the plan shape of the banding join.

The gate corpus (documents.parquet) is 5k docs at sf0.1; this probes
the SAME operators (operators/dedup.py — no test doubles) at 40x-200x
that, which is where a quadratic or driver-bound step would surface.

Synthesis (deterministic, seedless): doc i draws 60 words from a
100-word vocabulary by xxhash64(i, j); 2% of docs (i % 50 == 0)
instead re-use the text of base doc i % 1000, planting exact-dup
clusters the pipeline must find. Everything is codegen'd column math.

Usage: python tools/corpus_scale_smoke.py [n_docs ...]  (default
200_000 1_000_000)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def synth_docs(spark, n: int):
    vocab = F.array(*[F.lit(f"w{k:02d}") for k in range(100)])
    base = F.when(
        F.col("id") % 50 == 0, F.col("id") % 1000
    ).otherwise(F.col("id"))
    words = F.transform(
        F.sequence(F.lit(1), F.lit(60)),
        lambda j: F.element_at(
            vocab, (F.pmod(F.xxhash64(base, j), 100) + 1).cast("int")
        ),
    )
    return spark.range(n, numPartitions=spark.sparkContext.defaultParallelism).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", words).alias("text"),
    )


def main() -> int:
    sizes = [int(a) for a in sys.argv[1:]] or [200_000, 1_000_000]
    from open_tlm_spark.operators import dedup as D
    from open_tlm_spark.session import get_spark

    spark = get_spark("corpus-scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    import tempfile

    tmp = tempfile.mkdtemp(prefix="corpus_smoke_")
    for n in sizes:
        # Through parquet, not an in-memory plan: real corpora are
        # scanned from storage, and the write also freezes the input
        # so synthesis cost stays out of the measured phases.
        path = os.path.join(tmp, f"docs_{n}")
        synth_docs(spark, n).write.mode("overwrite").parquet(path)
        docs = spark.read.parquet(path)
        t0 = time.perf_counter()
        sh = D.shingle_table(docs)
        sig = D.minhash_signatures(sh)
        n_sig = sig.count()
        t_sig = time.perf_counter() - t0

        t1 = time.perf_counter()
        bands = D.lsh_bands(sig)
        edges = D.bucket_edges(bands.select(
            "doc_id",
            F.concat_ws("|", F.col("band_id").cast("string"), "band_key").alias("k"),
        ), "k")
        n_edges = edges.count()
        t_edges = time.perf_counter() - t1

        t2 = time.perf_counter()
        cc = D.connected_components(edges)
        n_nodes = cc.count()
        n_clusters = cc.select("lbl").distinct().count()
        t_cc = time.perf_counter() - t2

        total = time.perf_counter() - t0
        print(
            f"docs={n:>9,}  sig={t_sig:6.1f}s  band+edges={t_edges:6.1f}s "
            f"cc={t_cc:6.1f}s  total={total:6.1f}s  "
            f"({n / total:,.0f} docs/s)  edges={n_edges:,} "
            f"clustered_nodes={n_nodes:,} clusters={n_clusters:,}"
        )

    # ---- vector/ANN path at the same decades --------------------
    def synth_vecs(n: int):
        comp = F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda j: (
                (F.pmod(F.xxhash64(F.col("id"), j), 2000) - 1000) / 1000.0
            ).cast("float"),
        )
        return spark.range(
            n, numPartitions=spark.sparkContext.defaultParallelism
        ).select(F.col("id").alias("vec_id"), comp.alias("embedding"))

    from open_tlm_spark.operators import similarity as S

    for n in sizes:
        path = os.path.join(tmp, f"vecs_{n}")
        synth_vecs(n).write.mode("overwrite").parquet(path)
        emb = spark.read.parquet(path)
        cent = emb.filter(F.col("vec_id") < 64).select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("cvec"),
        )
        t0 = time.perf_counter()
        n_assigned = S.ivf_assign(emb, cent, dim=64).count()
        t_assign = time.perf_counter() - t0
        queries = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        t1 = time.perf_counter()
        n_topk = S.brute_force_topk(emb, queries, k=10, dim=64).count()
        t_bf = time.perf_counter() - t1
        print(
            f"vecs={n:>9,}  ivf_assign(64 cells)={t_assign:6.1f}s "
            f"({n / t_assign:,.0f} vec/s)  bruteforce top-10 x5q={t_bf:6.1f}s "
            f"assigned={n_assigned:,} topk_rows={n_topk}"
        )

    # ---- BM25 lexical ranking at the same decades ----------------
    # Separate synthesis: the query terms ("hash", "join", "vector")
    # must occur in the corpus, so 3 vocabulary slots carry them at
    # a ~3% natural rate.
    def synth_docs_bm25(n: int):
        words_pool = [f"w{k:02d}" for k in range(97)] + [
            "hash",
            "join",
            "vector",
        ]
        vocab = F.array(*[F.lit(w) for w in words_pool])
        words = F.transform(
            F.sequence(F.lit(1), F.lit(60)),
            lambda j: F.element_at(
                vocab,
                (F.pmod(F.xxhash64(F.col("id"), j), 100) + 1).cast("int"),
            ),
        )
        return spark.range(
            n, numPartitions=spark.sparkContext.defaultParallelism
        ).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", words).alias("text"),
        )

    from open_tlm_spark.plans.retrieval_queries import docs_bm25_topk

    for n in sizes:
        path = os.path.join(tmp, f"bm25_{n}")
        synth_docs_bm25(n).write.mode("overwrite").parquet(path)
        spark.read.parquet(path).createOrReplaceTempView("documents")
        t0 = time.perf_counter()
        n_rows = docs_bm25_topk(spark, "").count()
        t_bm25 = time.perf_counter() - t0
        print(
            f"bm25={n:>9,}  rank={t_bm25:6.1f}s "
            f"({n / t_bm25:,.0f} docs/s)  topk_rows={n_rows}"
        )

    # ---- round-6 audit family at the same decades -----------------
    # KL / fertility / Heaps over the docs corpus (reuses the parquet
    # written by the dedup section; adds the source/n_chars columns
    # the audit queries expect). All three are tokenize + keyed
    # aggregates — the checks here are (a) wall time grows ~linearly
    # in docs and (b) no plan degenerates (the queries are imported
    # UNWRAPPED, so they read this temp view, not the gate tables).
    from open_tlm_spark.plans.audit_queries import (
        docs_heaps_law_fit,
        source_unigram_kl,
        tokenizer_fertility_by_source,
    )

    for n in sizes:
        docs = spark.read.parquet(os.path.join(tmp, f"docs_{n}"))
        docs.select(
            "doc_id",
            "text",
            F.concat(
                F.lit("src"), (F.col("doc_id") % 20).cast("string")
            ).alias("source"),
            F.length("text").cast("long").alias("n_chars"),
        ).createOrReplaceTempView("documents")
        t0 = time.perf_counter()
        n_kl = source_unigram_kl(spark, "").count()
        t_kl = time.perf_counter() - t0
        t1 = time.perf_counter()
        n_f = tokenizer_fertility_by_source(spark, "").count()
        t_f = time.perf_counter() - t1
        t2 = time.perf_counter()
        n_h = docs_heaps_law_fit(spark, "").count()
        t_h = time.perf_counter() - t2
        print(
            f"audit={n:>9,}  kl={t_kl:6.1f}s  fertility={t_f:6.1f}s "
            f"heaps={t_h:6.1f}s  ({n / (t_kl + t_f + t_h):,.0f} docs/s "
            f"across all three)  rows={n_kl}/{n_f}/{n_h}"
        )

    # Plan shape proof: the banding self-view join must be a hash
    # equi-join on the band key (no cartesian/BNLJ at any size).
    docs = synth_docs(spark, 10_000)
    cand = D.lsh_candidates(D.minhash_signatures(D.shingle_table(docs)))
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    join_lines = [
        ln.strip() for ln in plan.splitlines()
        if "Join" in ln and "Broadcast" not in ln
    ]
    print("band join:", join_lines[0][:120] if join_lines else "(broadcast at this size)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
