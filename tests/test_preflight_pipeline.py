"""End-to-end preflight wiring (examples/preflight_pipeline.py): the
probe-derived stop-shingle cap reproduces the hand-tuned results on
the gate corpus, and a planted hot shingle is provably detected."""

from pyspark.sql import functions as F

from examples.preflight_pipeline import probed_dedup_pairs
from open_tlm_spark.operators import dedup as D
from open_tlm_spark.session import load_tables

SF = "/root/testdata/sf0.01"


def _pairs_set(df):
    return {(r.doc_a, r.doc_b, r.jaccard) for r in df.collect()}


def test_probed_cap_matches_hand_tuned_on_gate_corpus(spark):
    """On the gate corpus no shingle is hot (500 docs, sparse text),
    so the probed cap must be >= the static 100 and yield exactly the
    hand-tuned dedup_ngram_jaccard pair set — automation must not
    change answers where the human knob was already right."""
    load_tables(spark, SF)
    docs = spark.table("documents").select("doc_id", "text")
    pairs, max_df, hot = probed_dedup_pairs(spark, docs, min_jaccard=0.5)
    assert max_df >= 100
    assert hot == {}  # nothing provably above 10% of the corpus
    sh = D.shingle_table(docs)
    want = _pairs_set(
        D.ngram_jaccard_pairs(sh, min_jaccard=0.5, max_df=max_df)
    )
    assert _pairs_set(pairs) == want and len(want) > 0


def test_planted_hot_shingle_is_detected(spark):
    """Plant one shingle in 60% of docs: the probe must flag it with
    a lower bound clearing the stop_share line, and the derived cap
    must exclude it from the join (its df > max_df) while keeping
    cold shingles joinable."""
    rows = []
    for i in range(1000):
        text = f"unique{i} filler{i} words{i} tail{i} end{i}"
        if i % 10 < 6:
            text = "hot hot hot " + text  # same leading 3-shingle
        rows.append((i, text))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs, max_df, hot = probed_dedup_pairs(
        spark, docs, min_jaccard=0.1, stop_share=0.10
    )
    assert any(share >= 0.1 for share in hot.values())
    # 600 docs share the planted shingle; the cap must be below that
    # (stop_share * 1000 = 100 < 600) so the hot key never joins
    assert max_df < 600
    # cold shingles are per-doc unique -> no pairs survive the cap
    assert pairs.count() == 0
