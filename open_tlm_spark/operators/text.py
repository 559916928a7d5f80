"""Text-analysis operators for training-data pipelines.

Beyond reference parity (driver north-star, BASELINE.json): language
ID, quality scoring, token counting, document fingerprinting — all as
built-in column expressions (JVM-side, codegen'd; no Python UDFs), so
at 100 TB they are scan-bound narrow transformations with zero
shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language marker lexicons for the n-gram/stopword heuristic.
# Deterministic and SQL-expressible so the DuckDB oracle can replicate
# the exact same scoring (correctness is vs the declared heuristic,
# not vs ground-truth labels).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "von", "das"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "de", "que", "los"],
}

TOKEN_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"
STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization (array of non-empty tokens).

    Implemented as collapse-whitespace + trim + plain split rather
    than the obvious split + filter(t != '') — the filter lambda is an
    interpreted higher-order function that costs 5.5x on the full
    corpus (measured at sf0.1), while this form is entirely
    whole-stage-codegen'd. The when() guard keeps the empty/whitespace
    -only edge case identical to the filter form (empty array, not
    [''])."""
    trimmed = F.trim(F.regexp_replace(text, r"\s+", " "))
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, " ")
    )


def token_count_regex(text: Column) -> Column:
    """BPE-ish token count: words, numbers, and punctuation each count
    — regexp_count keeps it a single codegen'd expression."""
    return F.regexp_count(text, F.lit(TOKEN_PATTERN))


def marker_hits(text: Column, words: list[str]) -> Column:
    """Count of marker-word occurrences (word-boundary regex)."""
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(text), F.lit(pat))


def language_id(text: Column) -> Column:
    """Pick the language whose marker lexicon hits most.

    Deterministic rule (the oracle replicates it exactly): highest
    hit count wins; ties broken by language code DESC (struct
    array_max ordering); zero hits -> 'und'.
    """
    scored = F.array(
        *[
            F.struct(
                marker_hits(text, words).alias("hits"),
                F.lit(lang).alias("lang"),
            )
            for lang, words in sorted(LANG_MARKERS.items())
        ]
    )
    best = F.array_max(scored)
    return F.when(best["hits"] == 0, F.lit("und")).otherwise(best["lang"])


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring: length, word stats, punctuation / stopword /
    alpha ratios — the standard cheap pre-filters for web-scale corpora
    (C4/Gopher-style rules)."""
    t = F.col(text_col)
    toks = tokens(t)
    n_words = F.size(toks)
    n_chars = F.length(t)
    return df.select(
        "*",
        n_chars.alias("q_n_chars"),
        n_words.alias("q_n_words"),
        F.round(n_chars / n_words, 6).alias("q_avg_word_len"),
        F.round(
            F.regexp_count(t, F.lit(r"[^\w\s]")) / n_chars, 6
        ).alias("q_punct_ratio"),
        F.round(
            marker_hits(t, STOPWORDS) / n_words, 6
        ).alias("q_stopword_ratio"),
    )


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the sorted distinct token set —
    order/whitespace-insensitive near-exact dedup key (the classic
    'bag-of-words hash' fingerprint)."""
    return fingerprint_of(tokens(F.lower(text)))


def fingerprint_of(w: Column) -> Column:
    """fingerprint() over an already-tokenized array column — the
    entry point for consumers of a shared tokenized-corpus frame
    (identical bytes: same sort/join/md5 chain)."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(w)), " "))


def bigrams(w: Column) -> Column:
    """NON-distinct word 2-grams over a materialized token array —
    repetition scoring needs multiplicities, unlike the dedup
    shingles (which are distinct per doc)."""
    idx = F.sequence(F.lit(0), F.size(w) - 2)
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ",
            F.element_at(w, (i + 1).cast("int")),
            F.element_at(w, (i + 2).cast("int")),
        ),
    )
    return F.when(F.size(w) >= 2, gram).otherwise(
        F.array().cast("array<string>")
    )


def repetition_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tok: DataFrame | None = None,
) -> DataFrame:
    """Gopher-style repetition signals: duplicate-word fraction
    (1 - distinct/total tokens) and top-bigram fraction (occurrences
    of the most frequent 2-gram / total 2-grams). High values flag
    boilerplate / keyword-stuffed documents.

    dup_word_frac is a pure narrow projection; the bigram fraction is
    one explode + two hash aggregations (map-side partials collapse
    each doc's grams before the shuffle, so the shuffle carries one
    row per distinct (doc, gram) — bounded by document length, not
    corpus size).

    `tok` short-circuits the tokenize pass with a pre-tokenized
    (doc_id, w) frame (e.g. the session-shared tokenized corpus) —
    values are identical by construction.
    """
    from open_tlm_spark.session import fan_out

    if tok is None:
        tok = fan_out(df).select(
            F.col(id_col).alias("doc_id"),
            tokens(F.lower(F.col(text_col))).alias("w"),
        )
    base = tok.select(
        "doc_id",
        F.size("w").cast("long").alias("n_words"),
        F.round(1 - F.size(F.array_distinct("w")) / F.size("w"), 6).alias(
            "dup_word_frac"
        ),
    )
    grams = tok.select("doc_id", F.explode(bigrams(F.col("w"))).alias("g"))
    top = (
        grams.groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"), F.sum("c").alias("tot"))
    )
    return base.join(top, "doc_id", "left").select(
        "doc_id",
        "n_words",
        "dup_word_frac",
        F.round(F.col("top_c") / F.col("tot"), 6).alias("top_bigram_frac"),
    )


def doc_frequency(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Document frequency per token — the vocabulary-building /
    IDF-table step of a text pipeline: (token, df) where df counts
    DOCUMENTS containing the token (not occurrences).

    Per-doc distinct-ing happens BEFORE the explode, so the shuffle
    carries at most |vocab| x |docs| rows bounded by per-doc distinct
    tokens; map-side partial aggregation then collapses to one row
    per (partition, token) before the exchange — at corpus scale the
    shuffle volume is ~|vocab| per partition, independent of document
    count.
    """
    from open_tlm_spark.session import fan_out

    tok = fan_out(df).select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(tokens(F.lower(F.col(text_col))))
        ).alias("token"),
    )
    return tok.groupBy("token").agg(F.count(F.lit(1)).alias("df"))


# PII patterns: RE2-compatible (DuckDB) AND Java-regex-compatible
# (Spark) — only \d, \b, bounded repetition, plain char classes.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+\d{1,2}-\d{3}-\d{4}"


def pii_scrub(text: Column) -> dict[str, Column]:
    """PII detection + redaction as codegen'd column expressions:
    count then regexp_replace emails, IPv4 addresses, and phone
    numbers (in that order — emails are scrubbed before the IP pass
    so dotted hostnames can't double-match). Returns the counts and
    the scrubbed text; zero shuffles, scan-bound at any scale.
    """
    n_emails = F.regexp_count(text, F.lit(PII_EMAIL))
    after_email = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    n_ips = F.regexp_count(after_email, F.lit(PII_IPV4))
    after_ip = F.regexp_replace(after_email, PII_IPV4, "<IP>")
    n_phones = F.regexp_count(after_ip, F.lit(PII_PHONE))
    clean = F.regexp_replace(after_ip, PII_PHONE, "<PHONE>")
    return {
        "n_emails": n_emails,
        "n_ips": n_ips,
        "n_phones": n_phones,
        "clean": clean,
    }


# Rolling-hash fingerprint parameters (Rabin-Karp polynomial hash).
ROLL_BASE = 257
ROLL_MOD = 1_000_000_007


def rolling_fingerprint(text: Column, k: int = 8) -> Column:
    """Rolling-hash document fingerprint: the MINIMUM Rabin-Karp
    hash over all character k-grams (a 1-permutation minhash on char
    shingles — winnowing's selection rule with window = whole doc).
    Robust to word reordering at paragraph granularity where the
    bag-of-words fingerprint() is robust only to whole-doc shuffles.

    Arrow-batched by necessity, not preference: the same Horner fold
    as nested JVM higher-order functions runs INTERPRETED per
    (position x offset) — measured 27.6 s at sf0.1 vs ~0.5 s here.
    numpy evaluates positions vectorized with the k-step loop
    sequential, so each gram's hash is the exact Horner value and
    matches the DuckDB oracle's list_reduce bit-for-bit (int64 never
    overflows: acc < MOD*BASE + 255 << 2^63). NULL for docs shorter
    than k chars."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _roll(s):
        out = []
        for t in s:
            b = t.encode("utf-8")
            n = len(b)
            if t is None or n < k:
                out.append(None)
                continue
            c = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
            m = n - k + 1
            acc = np.zeros(m, dtype=np.int64)
            for j in range(k):  # Horner: sequential over the k offsets
                acc = (acc * ROLL_BASE + c[j:j + m]) % ROLL_MOD
            out.append(int(acc.min()))
        return pd.Series(out, dtype="object")

    # `from __future__ import annotations` stringifies inline hints,
    # which pandas_udf's type inference can't resolve — set them
    # post-hoc instead.
    _roll.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_roll, "long")(text)
