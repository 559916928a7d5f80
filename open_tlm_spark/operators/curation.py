"""Corpus-curation operators: deterministic sampling and sequence
packing for training-data pipelines.

Beyond reference parity (driver north-star): a 100 TB corpus is never
trained on as-is — it is re-weighted per domain/language and packed
into fixed token budgets. Both operators here are deterministic by
construction (hash-threshold sampling, ordered window packing) so the
DuckDB oracle reproduces them bit-for-bit and a re-run on the same
corpus yields the same sample — a reproducibility requirement for
training-data lineage, not just a test convenience.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Sampling rates are expressed out of HASH_BUCKETS for exact integer
# comparison (no float thresholds → no engine-rounding divergence).
HASH_BUCKETS = 10_000


def hash_bucket(id_col: Column, buckets: int = HASH_BUCKETS) -> Column:
    """Deterministic uniform bucket in [0, buckets): first 8 hex chars
    of md5 over the id's string form — identical in Spark and DuckDB,
    stable across runs/partitionings (unlike F.rand or hash(), whose
    seeds/implementations are engine-private).
    """
    word = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10)
    return (word.cast("long") % buckets).alias("bucket")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    id_col: str = "doc_id",
    default_rate: float = 1.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff its hash
    bucket falls below the stratum's rate. This is how domain/language
    mixture weights are applied at corpus scale — one narrow filter,
    no shuffle, no state; the sample is a pure function of (id, rate
    table), so incremental re-runs keep prior decisions.

    `rates` maps stratum value -> keep fraction in [0, 1].
    """
    thresh = F.lit(int(default_rate * HASH_BUCKETS))
    for val, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(strata_col) == val, F.lit(int(rate * HASH_BUCKETS))
        ).otherwise(thresh)
    return df.withColumn("bucket", hash_bucket(F.col(id_col))).filter(
        F.col("bucket") < thresh
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination by n-gram overlap: for every training
    document, count how many of its distinct n-word shingles appear
    anywhere in the benchmark/eval set. Standard pre-training hygiene
    (flag-and-drop docs that leak eval data); the output keeps every
    train doc with its overlap count and fraction so the caller picks
    the threshold.

    Scale shape: the benchmark side is tiny relative to the corpus by
    construction, so its distinct-shingle set is BROADCAST and probed
    with a LEFT join — the corpus side's shingles stream through
    map-side in ONE pass (shingling the 100 TB side twice, once per
    count, measured 2x slower at sf0.1), and the only wide op is the
    single per-doc count aggregate keyed on doc_id.
    """
    from open_tlm_spark.operators.dedup import shingle_table

    tsh = shingle_table(train, id_col=id_col, text_col=text_col, n=n)
    bsh = (
        shingle_table(bench, id_col=id_col, text_col=text_col, n=n)
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    out = (
        tsh.join(F.broadcast(bsh), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("_hit").alias("n_contaminated"),  # non-null = overlap
        )
    )
    return out.select(
        "doc_id",
        F.col("n_shingles").cast("long").alias("n_shingles"),
        F.col("n_contaminated").cast("long").alias("n_contaminated"),
        F.round(F.col("n_contaminated") / F.col("n_shingles"), 6).alias(
            "contam_frac"
        ),
    )


def chunk_by_tokens(
    df: DataFrame,
    size: int,
    stride: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into fixed-size token chunks with overlap
    (stride < size ⇒ size - stride tokens shared between neighbors) —
    the context-window chunking step that turns a curated corpus into
    model-ready sequences. A doc with n tokens yields
    1 + ceil(max(0, n - size) / stride) chunks; the last chunk may be
    short (never re-padded here — packing is a separate op).

    Pure narrow projection: tokenize, compute the chunk count from the
    token count, explode a `sequence()` of chunk indices, and slice
    the token array per index. No shuffle, no UDF — everything is
    whole-stage-codegen'd, so at 100 TB this runs at scan speed and
    the output partitioning inherits the input's.

    Output: (id, chunk_id, chunk_tokens, chunk_md5) — the md5 of the
    space-joined slice stands in for the chunk text so the result
    stays narrow; callers wanting the text swap the md5 for the join.
    """
    from open_tlm_spark.operators.text import tokens

    w = tokens(F.lower(F.col(text_col)))
    t = df.select(F.col(id_col), w.alias("_w"), F.size(w).alias("_n")).filter(
        F.col("_n") >= 1
    )
    n = F.col("_n")
    n_chunks = (
        F.when(n <= size, F.lit(1))
        .otherwise(
            F.floor((n - size + stride - 1) / F.lit(stride)).cast("long") + 1
        )
    )
    i = F.col("chunk_id")
    start = i * stride
    return t.select(
        id_col,
        "_w",
        "_n",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
            "chunk_id"
        ),
    ).select(
        id_col,
        i.alias("chunk_id"),
        F.least(F.lit(size), F.col("_n") - start).cast("long").alias(
            "chunk_tokens"
        ),
        F.md5(
            F.concat_ws(
                " ", F.slice(F.col("_w"), start + 1, F.lit(size))
            )
        ).alias("chunk_md5"),
    )


def pack_sequences(
    df: DataFrame,
    part_col: str,
    order_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Token-budget sequence packing: within each partition value,
    documents are taken in `order_col` order and chunked greedily so
    each pack holds ~`budget` tokens (pack_id = tokens consumed before
    this doc // budget — a doc straddling a boundary joins the earlier
    pack, so packs can exceed the budget by at most one document).

    This is the distributed-friendly packing: true first-fit-decreasing
    is inherently sequential, while the contiguous-greedy rule is ONE
    window cumulative sum — a single shuffle on the partition column.
    At 100 TB the partition column must be finer than `language` (a
    hot language would serialize into one task): pack within
    (language, shard) where shard = hash_bucket(id) % n_shards, then
    treat (language, shard, pack_id) as the global pack key — same
    single-shuffle shape, no skew.

    Output: one row per pack with doc count and token total.
    """
    w = Window.partitionBy(part_col).orderBy(order_col)
    toks = F.col(tokens_col)
    cum = F.sum(toks).over(w)
    packed = df.select(
        F.col(part_col),
        F.floor((cum - toks) / F.lit(budget)).alias("pack_id"),
        toks.alias("_tok"),
    )
    return packed.groupBy(part_col, "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_tok").cast("long").alias("pack_tokens"),
    )
