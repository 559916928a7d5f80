"""Unit tests for histogram, sources, text, dedup, and similarity
operators (small hand-checkable inputs)."""

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from open_tlm_spark.operators.dedup import (
    exact_dedup,
    jaccard_for_pairs,
    lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingle_table,
    simhash,
    word_shingles,
)
from open_tlm_spark.operators.histogram import histogram, range_summary
from open_tlm_spark.operators.similarity import brute_force_topk, cosine, as_double
from open_tlm_spark.operators.text import (
    fingerprint,
    language_id,
    token_count_regex,
    tokens,
)
from open_tlm_spark.sources.points import melt_wide_table


def test_histogram_golden(spark):
    """10 distinct values 0..9 -> 10 buckets of width 0.9 (reference
    bucket rule: n = min(distinct, 30), clamp max into last)."""
    df = spark.createDataFrame([(float(i),) for i in range(10)], "value double")
    rows = histogram(df, "value").collect()
    assert len(rows) == 10
    assert all(r.n == 1 for r in rows)
    assert [r.bucket for r in rows] == list(range(10))


def test_histogram_constant(spark):
    df = spark.createDataFrame([(5.0,), (5.0,), (5.0,)], "value double")
    rows = histogram(df, "value").collect()
    assert len(rows) == 1 and rows[0].bucket == 0 and rows[0].n == 3


def test_range_summary(spark):
    df = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1), 1.0), ("a", dt.datetime(2024, 1, 2), 3.0)],
        "dataset_id string, ts timestamp, value double",
    )
    r = range_summary(df).collect()[0]
    assert (r.min_value, r.max_value, r.mean_value, r["count"]) == (1.0, 3.0, 2.0, 2)


def test_melt_wide_table(spark):
    """S9: the reference's Parquet upload client semantics
    (examples/upload_data.py:58-115): melt numeric columns, drop NaN."""
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1), 1.0, float("nan")), (dt.datetime(2024, 1, 2), 2.0, 5.0)],
        "t timestamp, cpu double, mem double",
    )
    out = melt_wide_table(df, "t", prefix="sys.").orderBy("dataset_id", "ts").collect()
    assert [(r.dataset_id, r.value) for r in out] == [
        ("sys.cpu", 1.0),
        ("sys.cpu", 2.0),
        ("sys.mem", 5.0),  # NaN dropped
    ]


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",)], "text string")
    got = df.select(word_shingles(F.col("text")).alias("s")).collect()[0].s
    assert got == ["a b c", "b c d"]
    short = spark.createDataFrame([("a b",)], "text string")
    assert short.select(word_shingles(F.col("text")).alias("s")).collect()[0].s == []


def test_exact_dedup_keeps_lowest_id(spark):
    df = spark.createDataFrame(
        [(3, "x"), (1, "x"), (2, "y")], "doc_id long, text string"
    )
    rows = {r.text: (r.keeper_id, r.n_copies) for r in exact_dedup(df, ["text"], "doc_id").collect()}
    assert rows == {"x": (1, 2), "y": (2, 1)}


def test_minhash_identical_docs_collide(spark):
    """Identical texts -> identical signatures -> LSH candidates ->
    Jaccard 1.0; a disjoint doc never pairs."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "entirely different words appear in this unrelated document text"),
        ],
        "doc_id long, text string",
    )
    sh = shingle_table(docs)
    sig = minhash_signatures(sh)
    cand = lsh_candidates(sig).collect()
    assert {(r.doc_a, r.doc_b) for r in cand} == {(1, 2)}
    verified = jaccard_for_pairs(lsh_candidates(sig), sh).collect()
    assert verified[0].jaccard == pytest.approx(1.0)


def test_ngram_jaccard_pairs(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "a b c d x"),
            (3, "p q r s t"),
        ],
        "doc_id long, text string",
    )
    sh = shingle_table(docs)
    rows = ngram_jaccard_pairs(sh, min_jaccard=0.1).collect()
    # docs 1,2 share shingles {a b c, b c d} of union size 4 -> 0.5
    assert len(rows) == 1
    assert (rows[0].doc_a, rows[0].doc_b) == (1, 2)
    assert rows[0].jaccard == pytest.approx(0.5)


def test_simhash_deterministic_and_similar(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h"), (3, "z y x w v u t s")],
        "doc_id long, text string",
    )
    rows = simhash(shingle_table(docs)).collect()
    by_id = {r.doc_id: r.simhash for r in rows}
    assert by_id[1] == by_id[2]
    assert by_id[1] != by_id[3]
    assert 0 <= by_id[1] < 2**16


def test_cosine_topk(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [1.0, 0.1]),
            (2, [0.0, 1.0]),
            (3, [-1.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    q = spark.createDataFrame([(0, [1.0, 0.0])], "query_id long, query_vec array<float>")
    rows = brute_force_topk(emb, q, k=2, dim=2).orderBy("rank").collect()
    assert [r.vec_id for r in rows] == [1, 2]
    assert rows[0].cos_sim == pytest.approx(1 / (1.01) ** 0.5, abs=1e-6)


def test_text_functions(spark):
    df = spark.createDataFrame(
        [("The cat and the dog, in to of!",)], "text string"
    )
    r = df.select(
        F.size(tokens(F.col("text"))).alias("nt"),
        token_count_regex(F.col("text")).alias("nr"),
        language_id(F.col("text")).alias("lang"),
        fingerprint(F.col("text")).alias("fp"),
    ).collect()[0]
    assert r.nt == 8
    # words: The cat and the dog in to of (8) + ',' + '!' = 10
    assert r.nr == 10
    assert r.lang == "en"
    assert len(r.fp) == 32

    # fingerprint is word-order insensitive
    df2 = spark.createDataFrame([("dog! the cat and the, in of to",)], "text string")
    assert df2.select(fingerprint(F.col("text")).alias("fp")).collect()[0].fp != r.fp
    # (punctuation attaches to tokens -> different bag; same bag matches:)
    df3 = spark.createDataFrame([("of! in to the dog, cat and The",)], "text string")
    assert df3.select(fingerprint(F.col("text")).alias("fp")).collect()[0].fp == r.fp


def test_language_id_und(spark):
    df = spark.createDataFrame([("xyzzy plugh foobar",)], "text string")
    assert df.select(language_id(F.col("text")).alias("l")).collect()[0].l == "und"


# ---------------------------------------------------------- interval join
def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_interval_join_boundaries(spark):
    """[start, end) semantics: start inclusive, end exclusive; a probe
    row can land in several overlapping windows; bucket width smaller
    than the window must not drop matches (multi-bucket expansion)."""
    from open_tlm_spark.operators.interval import interval_join

    probe = spark.createDataFrame(
        [(1, _ts(0)), (2, _ts(5)), (3, _ts(10)), (4, _ts(59))],
        "id long, ts timestamp",
    )
    windows = spark.createDataFrame(
        [(10, _ts(0), _ts(10)), (20, _ts(5), _ts(59))],
        "wid long, w_start timestamp, w_end timestamp",
    )
    got = {
        (r.id, r.wid)
        for r in interval_join(
            probe, windows, "ts", "w_start", "w_end", bucket_seconds=3
        ).collect()
    }
    # id=1 at :00 -> window 10 only; id=2 at :05 -> both; id=3 at :10
    # -> window 20 only (end-exclusive for 10); id=4 at :59 -> none
    # (end-exclusive for 20)
    assert got == {(1, 10), (2, 10), (2, 20), (3, 20)}

    both = {
        (r.id, r.wid)
        for r in interval_join(
            probe, windows, "ts", "w_start", "w_end",
            bucket_seconds=3, closed="both",
        ).collect()
    }
    assert both == {(1, 10), (2, 10), (2, 20), (3, 10), (3, 20), (4, 20)}


def test_interval_join_is_equi_join(spark):
    """The scale contract: the bucketed rewrite must plan as a hash /
    sort-merge EQUI-join on the bucket key — never a
    BroadcastNestedLoopJoin (the O(n*m) theta-join fallback)."""
    from open_tlm_spark.operators.interval import interval_join

    probe = spark.createDataFrame([(1, _ts(0))], "id long, ts timestamp")
    windows = spark.createDataFrame(
        [(10, _ts(0), _ts(10))], "wid long, w_start timestamp, w_end timestamp"
    )
    plan = interval_join(
        probe, windows, "ts", "w_start", "w_end"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_lsh_bucket_topk_agrees_with_bruteforce(spark):
    """Within one LSH bucket the scoring is exact: any pair the LSH
    path returns must carry the same cosine the brute-force path
    assigns it."""
    from open_tlm_spark.operators.similarity import (
        hyperplane_signatures,
        lsh_bucket_topk,
    )

    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    hp = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("h_id"), F.col("embedding").alias("hvec")
    )
    corpus = hyperplane_signatures(emb, hp)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id")
    )
    lsh = {
        (r.query_id, r.vec_id): r.cos_sim
        for r in lsh_bucket_topk(corpus, queries, k=5).collect()
    }
    bf = {
        (r.query_id, r.vec_id): r.cos_sim
        for r in brute_force_topk(
            emb,
            emb.filter(F.col("vec_id") < 3).select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec"),
            ),
            k=40,
        ).collect()
    }
    assert lsh, "LSH buckets unexpectedly empty"
    for pair, score in lsh.items():
        assert bf[pair] == pytest.approx(score, abs=1e-9)


def test_approx_sketches_within_rsd_bounds(spark):
    """approx_distinct_stats can't be hash-gated (HLL/quantile
    sketches are engine-specific), so pin it here: every HLL distinct
    estimate within its configured rsd (x5 slack) of the exact
    count, and every approx percentile within the neighboring exact
    percentile band, on the real sf0.001 events table."""
    sf_dir = "/root/testdata/sf0.001"
    from open_tlm_spark.plans.extended_queries import (
        approx_distinct_stats,
        distinct_stats_exact,
    )
    from open_tlm_spark.session import load_tables

    load_tables(spark, sf_dir)
    approx = {r["event_type"]: r for r in approx_distinct_stats(spark, sf_dir).collect()}
    exact = {r["event_type"]: r for r in distinct_stats_exact(spark, sf_dir).collect()}
    pcts = {
        r["event_type"]: r
        for r in spark.table("events")
        .groupBy("event_type")
        .agg(
            F.expr("percentile(value, array(0.45, 0.5, 0.55))").alias("p50_band"),
            F.expr("percentile(value, array(0.90, 0.95, 0.975))").alias("p95_band"),
            F.expr("percentile(value, array(0.97, 0.99, 0.999))").alias("p99_band"),
        )
        .collect()
    }
    assert set(approx) == set(exact) and approx
    for et, a in approx.items():
        e = exact[et]
        # default rsd 0.05 for both counts; allow 5x slack
        assert abs(a["approx_users"] - e["n_users"]) <= max(3, 0.25 * e["n_users"])
        assert abs(a["approx_values"] - e["n_values"]) <= max(3, 0.25 * e["n_values"])
        p = pcts[et]
        for key, band in (("approx_p50", "p50_band"), ("approx_p95", "p95_band"), ("approx_p99", "p99_band")):
            lo, _, hi = p[band]
            assert lo - 1e-9 <= a[key] <= hi + 1e-9, f"{et} {key}={a[key]} outside [{lo},{hi}]"


def test_multimodal_resize_and_frame_sample(spark):
    """Resize keeps aspect via rational integer math; frame sampling
    emits every k-th 16-byte frame with a byte-sum feature."""
    from pyspark.sql import Row

    from open_tlm_spark.operators.multimodal import (
        resize_media,
        sample_frames,
        synth_media,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="a" * 1000), Row(doc_id=2, text="b" * 10)]
    )
    media = synth_media(docs, "doc_id", "text")

    rs = {r.media_id: r for r in resize_media(media, 320, 240).collect()}
    # doc 1: n=1004 -> w=365, h=45; width-bound scale 320/365
    assert (rs[1].width, rs[1].height) == (365, 45)
    assert rs[1].out_w == 365 * 320 // 365 and rs[1].out_h == 45 * 320 // 365
    # doc 2: n=14 -> 15x15, fits -> unchanged
    assert (rs[2].out_w, rs[2].out_h) == (15, 15)

    fr = sample_frames(media, every_k=4).collect()
    by_doc = {}
    for r in fr:
        by_doc.setdefault(r.media_id, []).append(r)
    # doc 1: 1000 bytes -> 63 frames -> frames 0,4,...,60 -> 16 rows
    assert [r.frame_no for r in sorted(by_doc[1], key=lambda r: r.frame_no)] == list(
        range(0, 63, 4)
    )
    full = [r for r in by_doc[1] if r.frame_no < 60]
    assert all(r.frame_feature == 16 * ord("a") for r in full)
    # doc 2: 10 bytes -> 1 frame (frame 0), feature = 10 * 'b'
    assert len(by_doc[2]) == 1 and by_doc[2][0].frame_feature == 10 * ord("b")


def test_rolling_fingerprint(spark):
    """Min Rabin-Karp 8-gram hash: equal for identical text, equal
    under paragraph reordering when the k-gram set is preserved,
    NULL below k chars; value pinned by direct Horner computation."""
    from open_tlm_spark.operators.text import ROLL_BASE, ROLL_MOD, rolling_fingerprint

    rows = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "abcdefghij"), (3, "short"), (4, "zyxwvutsrq")],
        "doc_id long, text string",
    ).select("doc_id", rolling_fingerprint(F.col("text")).alias("fp")).collect()
    fp = {r.doc_id: r.fp for r in rows}
    assert fp[1] == fp[2] and fp[1] != fp[4] and fp[3] is None

    def gram_hash(s):
        acc = 0
        for ch in s:
            acc = (acc * ROLL_BASE + ord(ch)) % ROLL_MOD
        return acc

    t = "abcdefghij"
    expect = min(gram_hash(t[i:i + 8]) for i in range(len(t) - 7))
    assert fp[1] == expect


def test_kmeans_train_properties(spark):
    """sim_ivf_train has no SQL oracle (float mean order); pin it
    here: deterministic across runs, cells partition the corpus, and
    training IMPROVES the assignment objective (mean best-cosine)
    over the deterministic init."""
    from open_tlm_spark.operators.similarity import (
        as_double,
        dot,
        kmeans_train,
        normalized,
    )
    from open_tlm_spark.session import load_tables

    load_tables(spark, "/root/testdata/sf0.001")
    emb = spark.table("embeddings")
    n_vecs = emb.count()

    a = kmeans_train(emb, k=8, iters=2).collect()
    b = kmeans_train(emb, k=8, iters=2).collect()
    assert sorted((r.centroid_id, r.n_members) for r in a) == sorted(
        (r.centroid_id, r.n_members) for r in b
    )
    assert sum(r.n_members for r in a) == n_vecs
    assert len(a) <= 8

    def objective(cent_rows):
        cents = spark.createDataFrame(
            [(r.centroid_id, list(r.cnvec)) for r in cent_rows],
            "centroid_id int, cnvec array<double>",
        )
        e = normalized(
            emb.select("vec_id", as_double(F.col("embedding")).alias("vec")), "vec"
        ).select("vec_id", "nvec")
        best = (
            e.join(F.broadcast(cents))
            .select("vec_id", dot(F.col("nvec"), F.col("cnvec")).alias("cs"))
            .groupBy("vec_id")
            .agg(F.max("cs").alias("best"))
        )
        return best.agg(F.avg("best")).collect()[0][0]

    init = [
        type("R", (), {"centroid_id": i, "cnvec": r.nvec})
        for i, r in enumerate(
            normalized(
                emb.select("vec_id", as_double(F.col("embedding")).alias("vec")),
                "vec",
            )
            .orderBy("vec_id")
            .limit(8)
            .collect()
        )
    ]
    trained = kmeans_train(emb, k=8, iters=2).collect()
    assert objective(trained) > objective(init)


def test_kmeans_train_exact_matches_float_form(spark):
    """r14: sim_ivf_train moved to kmeans_train_exact (DECIMAL-exact
    order-independent centroid means) so the gate can carry a real
    DuckDB oracle. Pin the A/B: the exact form's 2-iteration
    memberships equal the float form's on the gate data, its
    centroids are unit-norm, and the cells partition the corpus."""
    import math

    from open_tlm_spark.operators.similarity import (
        kmeans_train,
        kmeans_train_exact,
    )
    from open_tlm_spark.session import load_tables

    load_tables(spark, "/root/testdata/sf0.001")
    emb = spark.table("embeddings")
    n_vecs = emb.count()

    exact = kmeans_train_exact(emb, k=8, iters=2).collect()
    floatf = kmeans_train(emb, k=8, iters=2).collect()
    assert sorted((r.centroid_id, r.n_members) for r in exact) == sorted(
        (r.centroid_id, r.n_members) for r in floatf
    )
    assert sum(r.n_members for r in exact) == n_vecs
    for r in exact:
        assert math.isclose(
            sum(x * x for x in r.cnvec), 1.0, rel_tol=1e-9
        ), r.centroid_id


def test_connected_components_merges_transitively(spark):
    """Hash-min CC: a chain spanning two edge generators collapses to
    one cluster labeled by its minimum node; disjoint components stay
    apart; the fixed point is reached within the diameter bound."""
    from open_tlm_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        # component {1,2,3,4} as a chain, component {10, 11}, and a
        # star {20, 21, 22}
        [(2, 1), (2, 3), (3, 4), (10, 11), (20, 21), (20, 22)],
        "src long, dst long",
    )
    got = {
        (r.node, r.lbl) for r in connected_components(edges).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_connected_components_matches_union_find(spark):
    """Property check: on seeded random graphs (including a deep
    120-node path, the worst case for label propagation's round
    count) the distributed hash-min CC must produce exactly the
    components a sequential union-find computes."""
    import random

    from open_tlm_spark.operators.dedup import connected_components

    def union_find_labels(edge_list):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edge_list:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {n: find(n) for n in parent}

    cases = []
    rng = random.Random(7)
    # deep path graph: diameter 119 exercises pointer jumping
    cases.append([(i, i + 1) for i in range(120)])
    # two seeded random sparse graphs
    for seed in (1, 2):
        r = random.Random(seed)
        cases.append(
            [(r.randrange(200), r.randrange(200)) for _ in range(150)]
        )
    for edge_list in cases:
        edge_list = [(a, b) for a, b in edge_list if a != b]
        expect = union_find_labels(edge_list)
        edges = spark.createDataFrame(edge_list, "src long, dst long")
        got = {
            r.node: r.lbl for r in connected_components(edges).collect()
        }
        assert got == expect


def test_bucket_edges_linear_star(spark):
    """bucket_edges yields |bucket|-1 star edges per bucket (never
    pairwise) and no self-edges for singleton buckets."""
    from open_tlm_spark.operators.dedup import bucket_edges

    df = spark.createDataFrame(
        [(1, "a"), (5, "a"), (9, "a"), (2, "b"), (7, "c")],
        "doc_id long, k string",
    )
    got = {(r.src, r.dst) for r in bucket_edges(df, "k").collect()}
    assert got == {(1, 5), (1, 9)}


def test_stratified_sample_deterministic_and_rated(spark):
    """Hash-threshold sampling: re-runs agree exactly; observed rates
    land near the target; unlisted strata keep the default rate."""
    from open_tlm_spark.operators.curation import stratified_sample

    df = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("s"),
    )
    rates = {"a": 0.25}
    one = stratified_sample(df, "s", rates, id_col="doc_id")
    two = stratified_sample(df, "s", rates, id_col="doc_id")
    rows = one.groupBy("s").count().collect()
    by = {r.s: r["count"] for r in rows}
    assert abs(by["a"] / 2000 - 0.25) < 0.05  # ~uniform md5 buckets
    assert by["b"] == 2000  # default rate 1.0 keeps everything
    assert sorted(r.doc_id for r in one.collect()) == sorted(
        r.doc_id for r in two.collect()
    )


def test_pack_sequences_budget_and_totals(spark):
    """Packing conserves docs/tokens, fills packs contiguously, and a
    pack exceeds the budget by at most one straddling document."""
    from open_tlm_spark.operators.curation import pack_sequences

    df = spark.createDataFrame(
        [(i, "x", 100 + (i % 3) * 70) for i in range(40)],
        "doc_id long, lang string, n_tok long",
    )
    packs = pack_sequences(df, "lang", "doc_id", "n_tok", budget=512).collect()
    assert sum(p.n_docs for p in packs) == 40
    assert sum(p.pack_tokens for p in packs) == sum(
        100 + (i % 3) * 70 for i in range(40)
    )
    # contiguous greedy: every pack except possibly the last holds >=
    # budget-minus-one-doc tokens; none exceeds budget + max doc size
    max_tok = 240
    for p in packs:
        assert p.pack_tokens < 512 + max_tok


def test_pii_scrub_counts_and_redacts(spark):
    from open_tlm_spark.operators.text import pii_scrub

    df = spark.createDataFrame(
        [
            (1, "mail a@b.com and c.d@e.org ip 10.0.0.1 call +1-555-1234"),
            (2, "nothing sensitive here"),
        ],
        "id long, t string",
    )
    sc = pii_scrub(F.col("t"))
    rows = {
        r.id: r
        for r in df.select(
            "id", sc["n_emails"].alias("e"), sc["n_ips"].alias("i"),
            sc["n_phones"].alias("p"), sc["clean"].alias("c"),
        ).collect()
    }
    assert (rows[1].e, rows[1].i, rows[1].p) == (2, 1, 1)
    assert rows[1].c == "mail <EMAIL> and <EMAIL> ip <IP> call <PHONE>"
    assert (rows[2].e, rows[2].i, rows[2].p) == (0, 0, 0)
    assert rows[2].c == "nothing sensitive here"


def test_decontaminate_counts_overlap(spark):
    """Train docs sharing a 3-gram with the bench set are flagged with
    the exact overlap count; clean docs report zero; docs shorter than
    the shingle width are absent (no shingles on either side)."""
    from open_tlm_spark.operators.curation import decontaminate

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),   # shares "the quick brown"
            (2, "entirely different words here"),
            (3, "too short"),                    # < 3 tokens -> absent
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown cat")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in decontaminate(train, bench).collect()}
    assert set(rows) == {1, 2}
    assert (rows[1].n_shingles, rows[1].n_contaminated) == (3, 1)
    assert rows[1].contam_frac == round(1 / 3, 6)
    assert (rows[2].n_contaminated, rows[2].contam_frac) == (0, 0.0)


def test_doc_frequency_counts_documents_not_occurrences(spark):
    from open_tlm_spark.operators.text import doc_frequency

    df = spark.createDataFrame(
        [(1, "spam spam eggs"), (2, "spam toast")],
        "doc_id long, text string",
    )
    got = {r.token: r.df for r in doc_frequency(df).collect()}
    assert got == {"spam": 2, "eggs": 1, "toast": 1}


def test_repetition_features_flags_boilerplate(spark):
    from open_tlm_spark.operators.text import repetition_features

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),
            (2, "all words here are unique tokens"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_features(df).collect()}
    assert rows[1].dup_word_frac == 0.75  # 1 distinct of 4
    assert rows[1].top_bigram_frac == 1.0  # every bigram is "spam spam"
    assert rows[2].dup_word_frac == 0.0
    assert rows[2].top_bigram_frac == 0.2  # 5 bigrams, all unique


def test_chunk_by_tokens_counts_and_overlap(spark):
    from open_tlm_spark.operators.curation import chunk_by_tokens

    # 10 tokens, size=4, stride=3 -> chunks at 0,3,6 cover 1-4,4-7,7-10
    # then 1 + ceil((10-4)/3) = 3 chunks; last is full (9+4>10 clamps? no:
    # start 6 -> tokens 7..10 = 4 tokens exactly).
    text = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"
    df = spark.createDataFrame(
        [(1, text), (2, "a b"), (3, "x")], "doc_id long, text string"
    )
    out = chunk_by_tokens(df, size=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[1]) == 3
    assert [r.chunk_tokens for r in sorted(by_doc[1], key=lambda r: r.chunk_id)] == [4, 4, 4]
    # short docs yield exactly one (short) chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_tokens == 2
    assert len(by_doc[3]) == 1 and by_doc[3][0].chunk_tokens == 1
    # neighboring chunks overlap by size - stride tokens: chunk1 of doc 1
    # starts at t3, i.e. md5 of "t3 t4 t5 t6"
    import hashlib

    mid = [r for r in by_doc[1] if r.chunk_id == 1][0]
    assert mid.chunk_md5 == hashlib.md5(b"t3 t4 t5 t6").hexdigest()


def test_chunk_last_chunk_is_short(spark):
    from open_tlm_spark.operators.curation import chunk_by_tokens

    # 6 tokens, size=4, stride=3 -> chunks at 0 (4 toks) and 3 (3 toks)
    df = spark.createDataFrame(
        [(1, "a b c d e f")], "doc_id long, text string"
    )
    rows = sorted(
        chunk_by_tokens(df, size=4, stride=3).collect(),
        key=lambda r: r.chunk_id,
    )
    assert [r.chunk_tokens for r in rows] == [4, 3]


def test_exact_quantiles_matches_numpy_linear(spark):
    """exact_quantiles (distributed two-phase selection,
    operators/histogram.py) must reproduce exact linear-interpolated
    quantiles — numpy's 'linear' method, DuckDB's quantile_cont,
    Spark's percentile() all agree — across shapes that stress the
    bin logic: uniform, heavy ties (few distinct values), all-equal
    (zero bin width), skewed magnitudes, and n smaller than n_bins."""
    import numpy as np

    from open_tlm_spark.operators.histogram import exact_quantiles

    rng = np.random.RandomState(7)
    datasets = {
        "uniform": rng.uniform(0, 1e5, 5000),
        "ties": rng.randint(0, 7, 4000).astype(float),
        "all_equal": np.full(100, 42.5),
        "skewed": np.exp(rng.uniform(0, 20, 3000)),
        "tiny": rng.uniform(-5, 5, 17),
    }
    fracs = [0.01, 0.25, 0.5, 0.75, 0.9375, 0.99]
    for name, arr in datasets.items():
        df = spark.createDataFrame([(float(v),) for v in arr], "v double")
        got = exact_quantiles(df, "v", fracs).collect()[0].qs
        want = np.quantile(arr, fracs, method="linear")
        assert np.allclose(got, want, rtol=0, atol=1e-9 * max(1, abs(want).max())), (
            name,
            list(got),
            list(want),
        )


def _agg_output_rows(df):
    """numOutputRows of the executed (bin, v) collapse aggregates:
    final-mode HashAggregate with exactly two grouping keys led by
    `bin#` and a count(1) (walks AQE query stages). Note Catalyst may
    constant-fold `v` into a literal key, so we match key COUNT, not
    the key's name."""
    import re

    found = []

    def walk(node):
        name = node.nodeName()
        if "HashAggregate" in name:
            s = node.simpleString(500)
            keys = re.search(r"keys=\[([^\]]*)\]", s)
            if (
                keys
                and keys.group(1).startswith("bin#")
                and keys.group(1).count(",") == 1
                and "functions=[count(1)]" in s
            ):
                it = node.metrics().iterator()
                while it.hasNext():
                    kv = it.next()
                    if kv._1() == "numOutputRows":
                        found.append(kv._2().value())
        for meth in ("executedPlan", "plan"):
            try:
                walk(getattr(node, meth)())
                return
            except Exception:
                pass
        ch = node.children()
        for i in range(ch.length()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return found


def test_exact_quantiles_phase2_bounded_under_ties(spark):
    """VERDICT r7 #3: heavy ties must NOT degenerate phase 2 into a
    near-full single-bin row sort. The (bin, value, count) collapse
    runs before the per-bin window, so the executed (bin, v) aggregate
    emits O(distinct-in-bin) rows — measured via SQL metrics, not
    inferred from the plan shape."""
    import numpy as np

    from open_tlm_spark.operators.histogram import exact_quantiles

    fracs = [0.1, 0.5, 0.9]

    # all-equal: 100k rows, ONE distinct value -> collapse to 1 row
    df = spark.range(100000).selectExpr("CAST(42.5 AS DOUBLE) AS v")
    q = exact_quantiles(df, "v", fracs)
    assert [r.qs for r in q.collect()] == [[42.5, 42.5, 42.5]]
    rows = _agg_output_rows(q)
    assert rows and max(rows) <= 1, rows

    # zipf-tied: 200k rows over 5 distinct values -> <= 5 collapsed
    df = spark.range(200000).selectExpr(
        "CAST(CASE WHEN id % 16 < 12 THEN 0 WHEN id % 16 < 14 THEN 1 "
        "WHEN id % 16 < 15 THEN 2 WHEN id % 4096 < 4095 THEN 3 "
        "ELSE 4 END AS DOUBLE) AS v"
    )
    arr = np.array(
        [0.0] * 150000
        + [1.0] * 25000
        + [2.0] * 12500
        + [3.0] * 12451
        + [4.0] * 49
    )
    q = exact_quantiles(df, "v", fracs)
    got = q.collect()[0].qs
    want = np.quantile(arr, fracs, method="linear")
    assert np.allclose(got, want, atol=1e-9), (list(got), list(want))
    rows = _agg_output_rows(q)
    assert rows and max(rows) <= 5, rows
