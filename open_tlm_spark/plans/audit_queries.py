"""Round-6 corpus / distribution audits: per-source unigram KL
divergence, tokenizer fertility, Heaps'-law vocabulary growth fit,
Benford first-digit audit, Bollinger bands, log-return volatility,
cross-correlation lag scan, reciprocal-rank fusion, Matryoshka
truncation recall, int8 scalar-quantization error, and
Efraimidis-Spirtakis weighted sampling.

All are public techniques (citations on each query); all follow the
registry conventions (identical aliases both engines, DECIMAL-exact
order-independent sums, 6-dp rounding before ranking, id tiebreaks,
floor(x*1e6+0.5)/1e6 for exact-rational means that can land on
round() tie boundaries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from open_tlm_spark.plans.registry import register
from open_tlm_spark.session import fan_out

# DuckDB mirror of text.tokens(lower(text)) — same CTE as the other
# plan modules.
_TOKS_CTE = r"""
    toks AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(lower(text), '\s+'),
                         t -> t <> '') AS w
      FROM documents
    )
"""

# ------------------------------------------------- source unigram KL
_KL_B = 1024  # hashed unigram buckets (fixed constant)
_KL_ALPHA = 0.5  # add-alpha smoothing
_KL_AB = _KL_ALPHA * _KL_B


@register(
    "source_unigram_kl",
    oracle=rf"""
    WITH {_TOKS_CTE},
    tok AS (
      SELECT source,
             ('0x' || substr(md5(unnest(w)), 1, 8))::BIGINT % {_KL_B}
               AS bucket
      FROM toks
    ),
    sb AS (
      SELECT source, bucket, count(*) AS c_sb
      FROM tok GROUP BY source, bucket
    ),
    ns AS (
      SELECT source, CAST(sum(c_sb) AS BIGINT) AS n_s
      FROM sb GROUP BY source
    ),
    cb AS (
      SELECT bucket, CAST(sum(c_sb) AS BIGINT) AS c_b
      FROM sb GROUP BY bucket
    ),
    tot AS (SELECT CAST(sum(c_b) AS BIGINT) AS n FROM cb),
    grid AS (
      SELECT ns.source, ns.n_s, u.i AS bucket
      FROM ns, UNNEST(range(0, {_KL_B})) AS u(i)
    ),
    j AS (
      SELECT g.source, g.n_s, g.bucket,
             coalesce(sb.c_sb, 0) AS c_sb,
             coalesce(cb.c_b, 0) AS c_b
      FROM grid g
      LEFT JOIN sb ON sb.source = g.source AND sb.bucket = g.bucket
      LEFT JOIN cb ON cb.bucket = g.bucket
    ),
    terms AS (
      SELECT source, n_s,
             round(((c_sb + {_KL_ALPHA}) / (n_s + {_KL_AB}))
                   * ln(((c_sb + {_KL_ALPHA}) / (n_s + {_KL_AB}))
                        / ((c_b + {_KL_ALPHA}) / (n + {_KL_AB}))),
                   6) AS term
      FROM j, tot
    )
    SELECT source, n_s AS n_tokens,
           CAST(sum(CAST(term AS DECIMAL(18,6))) AS DOUBLE) AS kl_nats
    FROM terms GROUP BY source, n_s
    """,
)
def source_unigram_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL divergence KL(P_source || P_corpus) over hashed
    unigram buckets (feature hashing a la DSIR; add-alpha smoothing)
    — the distribution-shift audit that says which sources' token
    statistics deviate most from the mixture, i.e. which ones a
    temperature-weighted mixture or a filter will move the most.

    Plan: ONE tokenize pass -> (source, bucket) counts; source and
    corpus marginals both derive from that one aggregate. The bucket
    space is a FIXED {_KL_B} constant, so the smoothing grid is
    |sources| x {_KL_B} rows and the corpus-bucket frame is
    broadcast-legitimate (fixed size), while per-source frames join
    unhinted (AQE decides — they scale with the source count). Each
    KL term is rounded to 6 dp and DECIMAL-summed, so the per-source
    sum is order-independent and engine-identical."""
    from open_tlm_spark.operators.text import tokens

    docs = fan_out(spark.table("documents"))
    tok = docs.select(
        "source",
        F.explode(tokens(F.lower(F.col("text")))).alias("token"),
    ).select(
        "source",
        (
            F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("long")
            % _KL_B
        ).alias("bucket"),
    )
    sb = tok.groupBy("source", "bucket").agg(
        F.count(F.lit(1)).alias("c_sb")
    )
    ns = sb.groupBy("source").agg(F.sum("c_sb").cast("long").alias("n_s"))
    cb = sb.groupBy("bucket").agg(F.sum("c_sb").cast("long").alias("c_b"))
    tot = cb.agg(F.sum("c_b").cast("long").alias("n"))
    spec = spark.range(_KL_B).select(F.col("id").alias("bucket"))
    grid = ns.join(F.broadcast(spec))
    j = (
        grid.join(sb, ["source", "bucket"], "left")
        .join(F.broadcast(cb), "bucket", "left")
        .join(F.broadcast(tot))
        .select(
            "source",
            "n_s",
            F.coalesce("c_sb", F.lit(0)).alias("c_sb"),
            F.coalesce("c_b", F.lit(0)).alias("c_b"),
            "n",
        )
    )
    p_s = (F.col("c_sb") + _KL_ALPHA) / (F.col("n_s") + _KL_AB)
    p_c = (F.col("c_b") + _KL_ALPHA) / (F.col("n") + _KL_AB)
    terms = j.select(
        "source",
        "n_s",
        F.round(p_s * F.log(p_s / p_c), 6)
        .cast("decimal(18,6)")
        .alias("term"),
    )
    return terms.groupBy("source", F.col("n_s").alias("n_tokens")).agg(
        F.sum("term").cast("double").alias("kl_nats")
    )


# ------------------------------------------- tokenizer fertility
@register(
    "tokenizer_fertility_by_source",
    oracle=rf"""
    WITH {_TOKS_CTE},
    tok AS (SELECT doc_id, source, unnest(w) AS token FROM toks),
    pd AS (
      SELECT source, doc_id,
             count(*) AS n_tok,
             CAST(sum(length(token)) AS BIGINT) AS n_ch,
             CAST(sum((length(token) + 3) // 4) AS BIGINT) AS n_sub
      FROM tok GROUP BY source, doc_id
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           CAST(sum(n_ch) AS BIGINT) AS n_chars,
           CAST(sum(n_sub) AS BIGINT) AS n_subwords,
           floor(CAST(sum(n_ch) AS DOUBLE) / sum(n_tok)
                 * 1000000 + 0.5) / 1000000.0 AS chars_per_token,
           floor(CAST(sum(n_sub) AS DOUBLE) / sum(n_tok)
                 * 1000000 + 0.5) / 1000000.0 AS subwords_per_token
    FROM pd GROUP BY source
    """,
)
def tokenizer_fertility_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tokenizer-fertility audit per source: characters per
    whitespace token and subwords per token under a fixed
    4-chars-per-subword BPE proxy (ceil(len/4)) — the budgeting
    statistic that converts a char-count corpus inventory into token
    budgets, and flags sources whose long-token text will inflate
    sequence lengths. (Real BPE fertility needs the trained merges;
    the ceil proxy keeps the audit tokenizer-free and deterministic.)

    Plan: one tokenize+explode pass, a per-(source, doc) partial
    aggregate (map-side combinable), then the per-source rollup.
    Means use the floor(x*1e6+0.5)/1e6 half-up form because exact
    integer ratios land on round() tie boundaries. Docs with zero
    tokens drop out of the explode (counted by the companion
    docs_length_histogram, which scans unexploded)."""
    from open_tlm_spark.operators.text import tokens

    docs = fan_out(spark.table("documents"))
    tok = docs.select(
        "source",
        "doc_id",
        F.explode(tokens(F.lower(F.col("text")))).alias("token"),
    )
    pd = tok.groupBy("source", "doc_id").agg(
        F.count(F.lit(1)).alias("n_tok"),
        F.sum(F.length("token")).cast("long").alias("n_ch"),
        F.sum(F.expr("(length(token) + 3) div 4")).cast("long").alias("n_sub"),
    )
    half_up = lambda c: (  # noqa: E731
        F.floor(c * 1_000_000 + F.lit(0.5)) / 1_000_000.0
    )
    return pd.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.sum("n_ch").cast("long").alias("n_chars"),
        F.sum("n_sub").cast("long").alias("n_subwords"),
        half_up(
            F.sum("n_ch").cast("double") / F.sum("n_tok")
        ).alias("chars_per_token"),
        half_up(
            F.sum("n_sub").cast("double") / F.sum("n_tok")
        ).alias("subwords_per_token"),
    )


# --------------------------------------------------- Heaps'-law fit
_HEAPS_K = 3  # tokens per vocabulary unit (k-grams, not unigrams: the
# corpus' unigram vocabulary saturates, so per-source distinct-word
# counts are constant — k-gram space is large enough to still grow)


@register(
    "docs_heaps_law_fit",
    oracle=rf"""
    WITH {_TOKS_CTE},
    tok AS (
      SELECT source,
             array_to_string(list_slice(w, u.i + 1, u.i + {_HEAPS_K}),
                             ' ') AS token
      FROM toks, UNNEST(range(0, len(w) - {_HEAPS_K - 1})) AS u(i)
      WHERE len(w) >= {_HEAPS_K}
    ),
    tc AS (
      SELECT source, token, count(*) AS c
      FROM tok GROUP BY source, token
    ),
    pts AS (
      SELECT source,
             CAST(round(ln(CAST(sum(c) AS DOUBLE)), 6)
               AS DECIMAL(18,6)) AS x,
             CAST(round(ln(CAST(count(*) AS DOUBLE)), 6)
               AS DECIMAL(18,6)) AS y
      FROM tc GROUP BY source
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS DOUBLE) AS sx,
             CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(CAST(x * y AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(y * y AS DECIMAL(38,12))) AS DOUBLE) AS syy
      FROM pts
    )
    SELECT n AS n_sources,
           round((n * sxy - sx * sy)
                 / nullif(n * sxx - sx * sx, 0), 6) AS beta,
           round((sy - (n * sxy - sx * sy)
                       / nullif(n * sxx - sx * sx, 0) * sx)
                 / n, 6) AS ln_k,
           round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                 / nullif((n * sxx - sx * sx) * (n * syy - sy * sy), 0),
                 6) AS r2
    FROM s
    """,
)
def docs_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth fit (Heaps 1978, public): regress
    ln(distinct {_HEAPS_K}-grams) on ln(total {_HEAPS_K}-grams)
    across sources — V = K n^beta with beta typically 0.4-0.6 for
    natural text. The corpus audit that predicts vocabulary size at
    100x the data and flags synthetic/templated sources (beta near 0:
    vocabulary saturates; near 1: near-random strings). Companion to
    documents_zipf_fit (rank-frequency slope; the two laws are
    duals). The vocabulary unit is the word {_HEAPS_K}-gram: this
    corpus' unigram vocab saturates (every source sees all ~31
    words — a degenerate zero-variance fit), while the k-gram space
    still grows. Degenerate inputs yield NULL fit columns via nullif
    guards in BOTH engines, not a divide-by-zero error.

    Plan: one tokenize+shingle pass -> (source, gram) counts; each
    source collapses to a single (ln n, ln V) point; the OLS is one
    DECIMAL-exact moment aggregate over |sources| points (identical
    association in both engines — the discount-elasticity pattern).
    Two shuffles at any corpus size, both keyed on (source[, gram])."""
    from open_tlm_spark.operators.text import tokens

    docs = fan_out(spark.table("documents"))
    w = tokens(F.lower(F.col("text")))
    grams = F.when(
        F.size(w) >= _HEAPS_K,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - _HEAPS_K),
            lambda i: F.array_join(F.slice(w, i + 1, _HEAPS_K), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    tok = docs.select(
        "source",
        F.explode(grams).alias("token"),
    )
    tc = tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("c"))
    pts = tc.groupBy("source").agg(
        F.round(F.log(F.sum("c").cast("double")), 6)
        .cast("decimal(18,6)")
        .alias("x"),
        F.round(F.log(F.count(F.lit(1)).cast("double")), 6)
        .cast("decimal(18,6)")
        .alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,12)"))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,12)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,12)"))
        .cast("double")
        .alias("syy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    beta = (n * sxy - sx * sy) / F.nullif(
        n * sxx - sx * sx, F.lit(0.0)
    )
    return s.select(
        n.alias("n_sources"),
        F.round(beta, 6).alias("beta"),
        F.round((sy - beta * sx) / n, 6).alias("ln_k"),
        F.round(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / F.nullif(
                (n * sxx - sx * sx) * (n * syy - sy * sy), F.lit(0.0)
            ),
            6,
        ).alias("r2"),
    )


# ----------------------------------------------- Benford audit
@register(
    "orders_benford_audit",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders
    ),
    g AS (SELECT digit, count(*) AS n_orders FROM d GROUP BY digit),
    tot AS (SELECT CAST(sum(n_orders) AS BIGINT) AS total FROM g)
    SELECT digit, n_orders,
           floor(CAST(n_orders AS DOUBLE) / total * 1000000 + 0.5)
             / 1000000.0 AS obs_share,
           round(log10(1 + 1.0 / digit), 6) AS exp_share,
           round(abs(floor(CAST(n_orders AS DOUBLE) / total
                           * 1000000 + 0.5) / 1000000.0
                     - round(log10(1 + 1.0 / digit), 6)), 6) AS abs_dev
    FROM g, tot
    """,
)
def orders_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit (Newcomb 1881 / Benford 1938,
    public): the distribution of leading digits of order totals vs
    the log10(1+1/d) law — the classic fraud/data-quality screen for
    transaction amounts (synthetic or fabricated values flunk it;
    multi-decade natural amounts follow it). Deviations here say the
    generator is uniform-ish, which is itself the audit's output.

    Determinism: the leading digit comes from the exact integer cents
    (round(price*100) — 2-dp money, never at a .5 double boundary),
    rendered via integer->string in both engines; shares use the
    half-up floor form. Plan: one scan, one 9-group aggregate, the
    1-row total cross-join-broadcast in — lazy, no driver action."""
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    d = spark.table("orders").select(
        F.substring(cents.cast("string"), 1, 1).cast("long").alias("digit")
    )
    g = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n_orders"))
    tot = g.agg(F.sum("n_orders").cast("long").alias("total"))
    obs = (
        F.floor(
            F.col("n_orders").cast("double") / F.col("total") * 1_000_000
            + F.lit(0.5)
        )
        / 1_000_000.0
    )
    exp = F.round(F.log10(1 + 1.0 / F.col("digit")), 6)
    return g.join(F.broadcast(tot)).select(
        "digit",
        "n_orders",
        obs.alias("obs_share"),
        exp.alias("exp_share"),
        F.round(F.abs(obs - exp), 6).alias("abs_dev"),
    )
