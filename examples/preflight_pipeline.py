"""Preflight-aware curation: the probe decides the knobs, not a human.

End-to-end wiring of `operators/preflight.py` into the jobs it
protects (VERDICT r7 #5a — "feeds operators/skew.py salting and dedup
max_df automatically"):

  1. PROBE the shingle column once (narrow Arrow Misra-Gries pass, no
     shuffle) — the same frame the dedup join will key on.
  2. DERIVE `max_df` from the probe: the stop-shingle cap that keeps
     the pairwise join off hot keys, floored at the sketch's own
     resolution so caps are never set on noise.
  3. DEDUP with the derived cap (`ngram_jaccard_pairs`).
  4. PROBE the series key of the telemetry stream and pick the rollup
     shape: `salted_rollup_auto` salts only when a series provably
     dominates.

At 100 TB this is the difference between a pipeline that is tuned
once per corpus SNAPSHOT (knobs drift stale as the corpus shifts) and
one that re-derives its skew defenses from a ~free probe on every
run. Tested end-to-end by tests/test_preflight_pipeline.py: the
probe-derived cap reproduces the hand-tuned gate results on the gate
corpus, and a planted hot shingle raises the derived cap's protection
without touching cold-shingle recall.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_tlm_spark.operators import dedup as D
from open_tlm_spark.operators.preflight import probe_hot_keys


def probed_dedup_pairs(
    spark: SparkSession,
    docs: DataFrame,
    min_jaccard: float = 0.5,
    stop_share: float = 0.10,
) -> tuple[DataFrame, int, dict]:
    """Near-dup pairs with a PROBED stop-shingle cap instead of the
    static max_df=100: one Misra-Gries pass over the shingle frame
    bounds every shingle's document frequency, and the cap lands at
    stop_share x n_docs (floored at the static default and at the
    sketch resolution — see HotKeyReport.recommended_max_df).

    Returns (pairs, max_df_used, probe_hot) so pipelines can log the
    decision; `probe_hot` maps each provably-hot shingle to its share
    — the keys the cap is protecting the join from."""
    sh = D.shingle_table(docs).localCheckpoint(eager=False)
    n_docs = docs.count()
    report = probe_hot_keys(sh, "shingle", k=256)
    max_df = report.recommended_max_df(n_docs, stop_share=stop_share)
    hot = report.hot_keys(min_share=stop_share)
    pairs = D.ngram_jaccard_pairs(sh, min_jaccard=min_jaccard, max_df=max_df)
    return pairs, max_df, hot


def main() -> int:
    import sys

    from open_tlm_spark.operators.preflight import salted_rollup_auto
    from open_tlm_spark.session import get_spark, load_tables

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("preflight-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, sf_dir)

    docs = spark.table("documents").select("doc_id", "text")
    pairs, max_df, hot = probed_dedup_pairs(spark, docs)
    print(
        f"dedup: probed max_df={max_df}, "
        f"{len(hot)} provably-hot shingles, "
        f"{pairs.count()} near-dup pairs"
    )

    points = spark.table("events").select(
        F.col("event_type").alias("dataset_id"), "ts", "value"
    )
    bin_col = (
        F.unix_seconds(F.col("ts")) - F.unix_seconds(F.col("ts")) % 1000
    )
    rollup, n_salts = salted_rollup_auto(points, bin_col, parallelism=32)
    print(f"rollup: n_salts={n_salts}, {rollup.count()} bins")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
