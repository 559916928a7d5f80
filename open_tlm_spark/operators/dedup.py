"""Deduplication operators for web-scale corpora.

Beyond reference parity (the reference explicitly tolerates duplicate
ingest — src/index.py:39-40; the driver's north-star asks for real
dedup). All variants are built from DataFrame ops; determinism is a
design requirement so the DuckDB oracle can replicate results bit-for-
bit: hashes come from md5 over utf-8 strings (identical in Spark and
DuckDB), and MinHash signatures are lexicographic minima of fixed-width
hex strings (= numeric minima of the underlying 128-bit values).

Scale notes (100 TB):
  * exact_dedup — one hash-partition shuffle on the key; with a
    pre-computed fingerprint column this is the cheapest possible
    full-corpus dedup.
  * shingles/minhash — narrow per-row transforms; the groupBy(doc)
    signature agg is one shuffle where map-side partial min() already
    collapses each doc's shingles.
  * LSH banding — shuffle keyed on (band_id, band_key); identical or
    boilerplate documents create hot buckets -> cap bucket width
    (documented) or salt; candidate verification joins only candidate
    pairs, never the full cross product.
  * stop-shingles — shingles appearing in more than `max_df` docs are
    dropped before the pairwise join (standard practice; an un-capped
    hot shingle turns the equi-join quadratic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from open_tlm_spark.operators.text import tokens

# MinHash geometry: 12 hashes = 4 bands x 3 rows -> s-curve threshold
# ~ (1/4)^(1/3) ≈ 0.63 Jaccard.
NUM_HASHES = 12
BAND_ROWS = 3
NUM_BANDS = NUM_HASHES // BAND_ROWS


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Exact dedup: keep the lowest-id row per key group, count the
    group. groupBy + min beats dropDuplicates here because the keeper
    choice is deterministic (dropDuplicates keeps an arbitrary row)."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias("keeper_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def _grams_over(w: Column, n: int) -> Column:
    """n-word shingles over an already-materialized token array
    column. IMPORTANT: `w` must be a plain column reference, not an
    inline expression — Catalyst does not CSE inside interpreted
    higher-order functions, so an inline tokens() would re-split the
    text per element (measured 12x slower at sf0.1)."""
    idx = F.sequence(F.lit(0), F.size(w) - n)
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(w, (i + k + 1).cast("int")) for k in range(n)]
        ),
    )
    return F.when(F.size(w) >= n, F.array_distinct(gram)).otherwise(
        F.array().cast("array<string>")
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-word shingles of lowercased whitespace tokens (for
    one-off column use; bulk paths should go through shingle_table)."""
    return _grams_over(tokens(F.lower(text)), n)


def shingle_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    tok: DataFrame | None = None,
) -> DataFrame:
    """Exploded (id, shingle) relation — the base for Jaccard/MinHash.

    Two-step projection: tokenize into a real column first, THEN
    build grams over the column reference (see _grams_over note).
    Input is fanned out first — the tokenize/gram/md5 chain downstream
    is the expensive narrow stage, and a single-split source would
    serialize it (see session.fan_out).

    `tok` short-circuits the tokenize pass with a pre-tokenized
    (doc_id, w) frame (e.g. the session-shared tokenized corpus) —
    values are identical by construction.
    """
    from open_tlm_spark.session import fan_out

    if tok is None:
        df = fan_out(df)
        tok = df.select(
            F.col(id_col).alias("doc_id"),
            tokens(F.lower(F.col(text_col))).alias("w"),
        )
    return tok.select(
        "doc_id", F.explode(_grams_over(F.col("w"), n)).alias("shingle")
    )


# Modulus for Kirsch-Mitzenmacher hash combination (large 32-bit prime).
KM_PRIME = 4_294_967_291


def minhash_signatures(sh: DataFrame, num_hashes: int = NUM_HASHES) -> DataFrame:
    """MinHash signature per doc via Kirsch-Mitzenmacher double
    hashing: ONE md5 per shingle yields two 32-bit words (w1, w2);
    h_j = (w1 + j*w2) mod p simulates k independent hashes
    (Kirsch & Mitzenmacher, 'Less Hashing, Same Performance', 2006 —
    public technique). 12x fewer digest computations than hashing
    per-j, with the same s-curve behavior. One groupBy with k
    min-aggregates — k column expressions, not k passes."""
    h = F.md5("shingle")
    w1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    w2 = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    hashed = sh.select(
        "doc_id", w1.alias("w1"), w2.alias("w2")
    )
    aggs = [
        F.min((F.col("w1") + F.lit(j) * F.col("w2")) % F.lit(KM_PRIME)).alias(
            f"sig_{j}"
        )
        for j in range(num_hashes)
    ]
    return hashed.groupBy("doc_id").agg(*aggs)


def lsh_bands(sig: DataFrame) -> DataFrame:
    """(doc_id, band_id, band_key) banding relation over a MinHash
    signature frame.

    Band keys are built in ONE projection (array of structs +
    explode) instead of a per-band union — a union scans the
    signature subtree once per band, and the signature frame is the
    expensive groupBy over the shingle relation."""
    structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[f"sig_{b * BAND_ROWS + r}" for r in range(BAND_ROWS)],
                    )
                ).alias("band_key"),
            )
            for b in range(NUM_BANDS)
        ]
    )
    return sig.select("doc_id", F.explode(structs).alias("bk")).select(
        "doc_id",
        F.col("bk.band_id").alias("band_id"),
        F.col("bk.band_key").alias("band_key"),
    )


def lsh_candidates(sig: DataFrame) -> DataFrame:
    """LSH banding: docs sharing any band's composite key are
    candidate pairs (doc_a < doc_b)."""
    banded = lsh_bands(sig)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def jaccard_for_pairs(pairs: DataFrame, sh: DataFrame) -> DataFrame:
    """Exact Jaccard for the given pairs via two shingle joins.

    |A ∩ B| from the equi-join on shingle; |A ∪ B| = |A| + |B| - |A∩B|.
    The sizes frame is one row per document — it scales WITH the
    corpus, so it is not broadcast-hinted: AQE picks broadcast when
    the runtime size fits (sf-scale) and falls back to a shuffle join
    keyed on doc_id at corpus scale, where the pairs side is already
    the (LSH-pruned) candidate set.
    """
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sa = sh.alias("sa")
    sb = sh.alias("sb")
    inter = (
        pairs.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(
            sb,
            (F.col("sb.doc_id") == F.col("doc_b"))
            & (F.col("sb.shingle") == F.col("sa.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.alias("za"), F.col("za.doc_id") == F.col("doc_a"))
        .join(sizes.alias("zb"), F.col("zb.doc_id") == F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter")
                / (F.col("za.n_sh") + F.col("zb.n_sh") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
    )


def stop_capped_shingles(sh: DataFrame, max_df: int = 100) -> DataFrame:
    """Stop-shingle removal: shingles in > max_df docs are dropped
    BEFORE any pairwise join — without this cap the hot-key self-join
    is quadratic at corpus scale."""
    df_counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    return sh.join(
        df_counts.filter(F.col("df") <= max_df).select("shingle"), "shingle"
    )


def ngram_pair_stats(
    sh: DataFrame, max_df: int | None = 100
) -> tuple[DataFrame, DataFrame]:
    """The shared heavy core of the pairwise n-gram measures: the
    stop-shingle cap (None = `sh` is already capped), the self
    equi-join with per-pair intersection counts, and the per-doc
    (post-cap) set sizes. Jaccard and containment are just different
    final formulas over the SAME (pairs, sizes) tables, so pipelines
    computing both measures (a standard corpus-dedup audit) pay the
    self-join once."""
    rare = sh if max_df is None else stop_capped_shingles(sh, max_df)
    a = rare.alias("a")
    b = rare.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    # sizes is 1 row/doc — corpus-scaling, so no broadcast hint: AQE
    # broadcasts when it fits and shuffle-joins on doc_id otherwise.
    sizes = rare.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    return pairs, sizes


def jaccard_from_pair_stats(
    pairs: DataFrame, sizes: DataFrame, min_jaccard: float
) -> DataFrame:
    """Jaccard scoring over ngram_pair_stats output: |A∩B| / |A∪B|."""
    out = (
        pairs.join(sizes.alias("za"), F.col("za.doc_id") == F.col("doc_a"))
        .join(sizes.alias("zb"), F.col("zb.doc_id") == F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter")
                / (F.col("za.n_sh") + F.col("zb.n_sh") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
    )
    return out.filter(F.col("jaccard") >= min_jaccard)


def ngram_jaccard_pairs(
    sh: DataFrame, min_jaccard: float, max_df: int = 100
) -> DataFrame:
    """All-pairs n-gram Jaccard >= threshold, with stop-shingle removal
    (shingles in > max_df docs are dropped BEFORE the pairwise join —
    without this the hot-key join is quadratic at corpus scale)."""
    pairs, sizes = ngram_pair_stats(sh, max_df)
    return jaccard_from_pair_stats(pairs, sizes, min_jaccard)


def bucket_edges(df: DataFrame, key_col: str, id_col: str = "doc_id") -> DataFrame:
    """Star edges (bucket-min-id -> member) for a near-dup bucket key.

    The linear alternative to a within-bucket pairwise join: a bucket
    of b docs yields b-1 edges instead of b*(b-1)/2 pairs, and the
    connected-components pass downstream recovers exactly the same
    clusters (any spanning subgraph of the bucket clique does). One
    shuffle keyed on the bucket key.
    """
    from pyspark.sql import Window

    root = F.min(id_col).over(Window.partitionBy(key_col))
    return (
        df.filter(F.col(key_col).isNotNull())  # NULL keys are not a bucket
        .select(F.col(id_col), root.alias("_root"))
        .filter(F.col(id_col) != F.col("_root"))
        .select(F.col("_root").alias("src"), F.col(id_col).alias("dst"))
    )


def connected_components(
    edges: DataFrame, max_iters: int = 25
) -> DataFrame:
    """Connected components via hash-min label propagation: every node
    repeatedly adopts the minimum label among itself and its
    neighbors; at the fixed point each component is labeled by its
    minimum node id. The standard MapReduce/Spark CC formulation
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14 — public technique), converging in O(graph diameter)
    rounds; dedup clusters built from bucket stars have diameter <= 4,
    so the loop runs 2-3 rounds in practice.

    Each round is one equi-join shuffle + one min-aggregate shuffle,
    with an eager localCheckpoint cutting lineage (without it round
    N's plan re-executes every earlier round). The driver-side loop
    only compares two scalar checksums per round — all data movement
    is distributed.

    Input: (src, dst) edge frame. Output: (node, lbl) for every node
    that appears in an edge; singletons are absent (callers outer-join
    and coalesce to the node's own id).

    Known input constraint: edges must derive from a storage-backed
    scan (parquet/view), as every engine path does. An input built on
    an in-memory checkpointed plan (localCheckpoint over spark.range)
    trips a Catalyst "key not found: node#N" during the loop's lazy
    checkpoints (observed on Spark 4.1; tools/corpus_scale_smoke.py
    routes its synthetic corpus through parquet for this reason).
    """
    # Materialize the edge set ONCE before anything fans out from it:
    # `und` reads it twice and every round joins it, so an un-cut
    # edge pipeline (fingerprints, UDFs, window mins) would be planned
    # and executed once per consumer.
    edges = edges.select("src", "dst").localCheckpoint(eager=True)
    und = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # Init = min(self, all neighbors) via ONE aggregate (every node
    # appears as dst in `und` because it carries both directions) —
    # a full propagation round without its join.
    labels = (
        und.select(F.col("dst").alias("node"), F.col("src").alias("lbl"))
        .union(und.select(F.col("dst").alias("node"), F.col("dst").alias("lbl")))
        .groupBy("node")
        .agg(F.min("lbl").alias("lbl"))
        .localCheckpoint(eager=False)
    )

    def step(lab: DataFrame) -> DataFrame:
        # Neighbor propagation (1 hop) + pointer jumping (label-of-
        # label, which halves remaining label distance): min over
        # {self, neighbors' labels, label's label}.
        nbr = und.join(lab, und.src == lab.node).select(
            F.col("dst").alias("node"), "lbl"
        )
        a, b = lab.alias("a"), lab.alias("b")
        jump = a.join(b, F.col("a.lbl") == F.col("b.node")).select(
            F.col("a.node").alias("node"), F.col("b.lbl").alias("lbl")
        )
        return (
            lab.union(nbr)
            .union(jump)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
        )

    # Min-labels only ever decrease, so sum(lbl) strictly decreases
    # until the fixed point — a single-scalar convergence test whose
    # action also materializes the round's lazy checkpoint. Each
    # driver round runs TWO propagation steps (4 hops with jumping):
    # per-round cost at gate scale is Spark fixed overhead, not data,
    # so deeper plans per action are a straight win.
    prev_sum = None
    for _ in range(max_iters):
        cur_sum = labels.agg(F.sum("lbl")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
        labels = step(step(labels)).localCheckpoint(eager=False)
    return labels


def simhash(
    sh: DataFrame, bits: int = 16
) -> DataFrame:
    """SimHash over the (doc_id, shingle) relation: bit b of the
    fingerprint is 1 iff more shingles have bit b of their hash set
    than not (majority vote). Hash = first bits/4 hex chars of md5.

    Shape: one codegen'd projection computing the hash integer once
    per shingle, then ONE hash aggregation with `bits` conditional
    sums. (A per-row higher-order-function fold is semantically
    identical but runs interpreted — measured 30-180x slower.)
    Output: (doc_id, simhash) — docs with equal fingerprints are
    near-dup buckets; refine with Hamming distance.
    """
    nib = bits // 4
    hv = sh.select(
        "doc_id",
        F.conv(F.substring(F.md5("shingle"), 1, nib), 16, 10)
        .cast("long")
        .alias("h"),
    )
    votes = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(1 << b)) > 0, 1).otherwise(-1)
        ).alias(f"v_{b}")
        for b in range(bits)
    ]
    agg = hv.groupBy("doc_id").agg(*votes)
    fp = None
    for b in range(bits):
        term = F.when(F.col(f"v_{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return agg.select("doc_id", fp.cast("long").alias("simhash"))


def ngram_containment_pairs(
    sh: DataFrame, min_containment: float, max_df: int = 100
) -> DataFrame:
    """All-pairs n-gram CONTAINMENT >= threshold: |A∩B| / min(|A|,|B|)
    — the asymmetric near-dup measure (Broder, 'On the resemblance and
    containment of documents', 1997 — public technique). Catches
    subset duplicates symmetric Jaccard misses: a short document
    quoted whole inside a long one has high containment but low
    Jaccard, and corpus pipelines drop exactly those quote-inclusion
    dups. Same linear plan as ngram_jaccard_pairs: stop-shingle cap
    before the self equi-join, broadcast size dims after."""
    pairs, sizes = ngram_pair_stats(sh, max_df)
    return containment_from_pair_stats(pairs, sizes, min_containment)


def containment_from_pair_stats(
    pairs: DataFrame, sizes: DataFrame, min_containment: float
) -> DataFrame:
    """Containment scoring over ngram_pair_stats output:
    |A∩B| / min(|A|, |B|)."""
    out = (
        pairs.join(sizes.alias("za"), F.col("za.doc_id") == F.col("doc_a"))
        .join(sizes.alias("zb"), F.col("zb.doc_id") == F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter")
                / F.least(F.col("za.n_sh"), F.col("zb.n_sh")),
                6,
            ).alias("containment"),
        )
    )
    return out.filter(F.col("containment") >= min_containment)


# --------------------------------------------------------- winnowing
WINNOW_K = 3  # tokens per k-gram
WINNOW_W = 4  # k-gram hashes per winnowing window
_WINNOW_POS_BITS = 20  # pack = hash << POS_BITS | pos  (pos < 2^20)


def winnow_fingerprints(
    docs: DataFrame, tok: DataFrame | None = None
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting",
    SIGMOD 2003 — the MOSS algorithm; public technique).

    Per document: hash every K-token k-gram by position, then select
    the minimum hash of every window of W consecutive k-grams. The
    guarantee: any substring match of at least W+K-1 tokens shares at
    least one selected fingerprint, while only ~2/(W+1) of positions
    are kept — position-robust dedup keys at a fraction of the
    shingle volume.

    Plan: one k-gram transform (narrow) over the (optionally shared)
    tokenized corpus, one per-doc rows-frame window min on a packed
    (hash << POS_BITS | pos) BIGINT (doc-partitioned — thousands of
    small partitions), one distinct. Hash is 36 bits of the gram's
    md5 (collisions only merge fingerprints identically in every
    engine); the hash is recovered by integer shift, not double
    division (packs above 2^53 lose low bits on a double
    round-trip). Returns (doc_id, fp) distinct rows.

    r14 note (guide §1.1 measure first): a zero-exchange ARRAY-NATIVE
    form (grams, packs, the W-wide sliding min, and the per-doc
    distinct all inside one projection of nested higher-order
    functions) was built, oracle-verified, and MEASURED ~3x SLOWER
    (interleaved min-of-6 at sf0.1: 2.02 s window form vs 5.96 s
    array form): transform/array_min/slice chains are
    CodegenFallback — every row pays an interpreted expression-tree
    walk over its whole gram array — while posexplode + window + the
    distinct's exchange all run compiled. "Winnowing is per-document,
    so no byte needs to cross the network" remains true in principle,
    but at this row width the compiled shuffle beats the interpreted
    no-shuffle. Reverted to the window form; the shared-tokens input
    (the `tok` short-circuit, which IS a measured win) is kept.

    `tok`, when given, short-circuits the tokenize with a
    pre-tokenized frame that MUST carry (doc_id, w) with
    w == tokens(lower(text)) — e.g. the session-shared tokenized
    corpus — and `docs` is then ignored (the ADVICE r13 contract
    note); values are identical by construction.
    """
    from open_tlm_spark.operators.text import tokens

    base = (
        tok.select("doc_id", "w")
        if tok is not None
        else docs.select(
            "doc_id", tokens(F.lower(F.col("text"))).alias("w")
        )
    )
    w = F.col("w")
    # Guard docs shorter than K tokens: sequence(0, size-K) with a
    # negative stop is descending and the slice throws — mirror the
    # oracle's len(w) >= K predicate with an empty gram array.
    grams = F.when(
        F.size(w) >= WINNOW_K,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - WINNOW_K),
            lambda i: F.array_join(F.slice(w, i + 1, WINNOW_K), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    kg = (
        base.select("doc_id", F.posexplode(grams).alias("pos", "gram"))
        # pos must fit in the pack's low POS_BITS; truncate the gram
        # stream (deterministically, both engines) past 2^20 grams so
        # a pathologically long doc can't bleed pos bits into the hash.
        .filter(F.col("pos") < (1 << _WINNOW_POS_BITS))
        .select(
            "doc_id",
            "pos",
            (
                F.conv(F.substring(F.md5("gram"), 1, 9), 16, 10).cast(
                    "long"
                )
                * (1 << _WINNOW_POS_BITS)
                + F.col("pos")
            ).alias("pack"),
        )
    )
    frame = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, WINNOW_W - 1)
    )
    n = Window.partitionBy("doc_id")
    sel = kg.select(
        "doc_id",
        "pos",
        F.min("pack").over(frame).alias("sel"),
        F.count(F.lit(1)).over(n).alias("n_grams"),
    ).filter(F.col("pos") <= F.col("n_grams") - WINNOW_W)
    return sel.select(
        "doc_id",
        F.shiftright(F.col("sel"), _WINNOW_POS_BITS).alias("fp"),
    ).distinct()


def winnow_pairs(
    fps: DataFrame, min_shared: int = 2, max_df: int = 50
) -> DataFrame:
    """Near-dup candidate pairs by shared winnowed fingerprints:
    fingerprints in more than max_df docs are dropped BEFORE the
    self-join (the stop-shingle discipline — keeps the hot-key join
    linear), pairs keep their shared-fingerprint count."""
    df_counts = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("df"))
    rare = fps.join(
        df_counts.filter(F.col("df") <= max_df).select("fp"), "fp"
    )
    a = rare.alias("a")
    b = rare.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
