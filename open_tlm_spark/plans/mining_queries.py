"""Round-6b pattern-mining / attribution / governance queries:
linear multi-touch attribution, association rules (support /
confidence / lift), quantile-SAX motif mining, spectral entropy,
training-shard balance audit, Theil-Sen robust trend, and a
k-anonymity group-size audit.

All are public techniques (citations on each query); all follow the
registry conventions (identical aliases both engines, DECIMAL-exact
order-independent sums, 6-dp rounding before ranking, id tiebreaks,
floor(x*1e6+0.5)/1e6 for exact-rational ratios that can land on
round() tie boundaries, CAST(sum(BIGINT) AS BIGINT) to keep DuckDB
off HUGEINT).
"""

from __future__ import annotations

import math as _math

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

# ---------------------------------------- linear attribution
_ATTR_LOOKBACK_US = 24 * 3600 * 1_000_000  # 24 h touch window


@register(
    "events_attribution_linear",
    oracle=f"""
    WITH p AS (
      SELECT event_id AS pid, user_id, epoch_us(ts) AS us, value
      FROM events WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT user_id, epoch_us(ts) AS us, event_type
      FROM events WHERE event_type IN ('view', 'click')
    ),
    j AS (
      SELECT p.pid, p.value, t.event_type AS touch
      FROM p LEFT JOIN t
        ON t.user_id = p.user_id
       AND t.us >= p.us - {_ATTR_LOOKBACK_US}
       AND t.us < p.us
    ),
    c AS (
      SELECT pid, value, touch,
             count(touch) OVER (PARTITION BY pid) AS n_t
      FROM j
    ),
    cr AS (
      SELECT coalesce(touch, 'direct') AS channel, pid,
             floor(value * 1e6 / greatest(n_t, 1) + 0.5) / 1e6
               AS credit
      FROM c
    )
    SELECT channel,
           count(DISTINCT pid) AS n_purchases,
           count(*) AS n_credits,
           CAST(sum(CAST(credit AS DECIMAL(18,6))) AS DOUBLE)
             AS attributed_value
    FROM cr GROUP BY channel
    """,
)
def events_attribution_linear(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Linear multi-touch attribution: each purchase's value is
    split equally across the user's view/click touches in the 24 h
    before it (purchases with no prior touch credit a synthetic
    'direct' channel in full) — the classic marketing-attribution
    model (equal-credit variant of Shapley position models, public
    in every analytics stack).

    Plan: the purchase->touch association is a user_id equi-join
    with a bounded time-range residual predicate — per-user touch
    density is bounded by the 24 h window, so the join output is
    linear in purchases at any corpus scale (never a global range
    join). The per-purchase fan-out count is a pid-partitioned
    window over that join (millions of tiny partitions — no global
    sort). Credit value/n is an exact rational that can land on a
    round() tie (e.g. value ending .25 split 2 ways), so both
    engines use the floor(x*1e6+0.5)/1e6 half-up form, then
    DECIMAL-sum per channel (order-free)."""
    ev = spark.table("events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("p_user"),
        F.unix_micros("ts").alias("p_us"),
        "value",
    )
    t = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("t_user"),
        F.unix_micros("ts").alias("t_us"),
        F.col("event_type").alias("touch"),
    )
    j = p.join(
        t,
        (F.col("t_user") == F.col("p_user"))
        & (F.col("t_us") >= F.col("p_us") - F.lit(_ATTR_LOOKBACK_US))
        & (F.col("t_us") < F.col("p_us")),
        "left",
    )
    # Collapse the (linear-but-large) join output to AT MOST 2-3
    # rows per purchase BEFORE any window: the per-(purchase,
    # channel) aggregate is map-side combinable, so the pid window
    # (for the total fan-out) runs over the tiny collapsed frame —
    # at 30M synthetic events this is the difference between 80 s
    # (windowing 78M wide join rows) and ~linear cost. Credit is
    # constant within a (pid, channel) group, so summing
    # credit x n_rows is DECIMAL-identical to summing per-row.
    pc = j.groupBy(
        "pid",
        "value",
        F.coalesce(F.col("touch"), F.lit("direct")).alias("channel"),
    ).agg(
        F.count("touch").alias("n_pc"),  # touches in this channel (0=direct)
        F.count(F.lit(1)).alias("n_rows"),
    )
    w = Window.partitionBy("pid")
    cr = pc.select(
        "channel",
        "pid",
        "n_rows",
        (
            F.floor(
                F.col("value") * F.lit(1e6)
                / F.greatest(F.sum("n_pc").over(w), F.lit(1))
                + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("credit"),
    )
    return cr.groupBy("channel").agg(
        F.countDistinct("pid").alias("n_purchases"),
        F.sum("n_rows").cast("long").alias("n_credits"),
        F.sum(F.col("credit").cast("decimal(18,6)") * F.col("n_rows"))
        .cast("double")
        .alias("attributed_value"),
    )


# ---------------------------------------- association rules
_AR_MIN_CO = 2  # min pair co-occurrence (support floor)
_AR_TOP = 30


@register(
    "orders_association_rules",
    oracle=f"""
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    nb AS (
      SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n FROM b
    ),
    ic AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
      FROM b GROUP BY 1
    ),
    pc AS (
      SELECT a.l_partkey AS part_a, c.l_partkey AS part_b,
             CAST(count(*) AS BIGINT) AS n_co
      FROM b a JOIN b c
        ON a.l_orderkey = c.l_orderkey
       AND a.l_partkey < c.l_partkey
      GROUP BY 1, 2
      HAVING count(*) >= {_AR_MIN_CO}
    ),
    s AS (
      SELECT pc.part_a, pc.part_b, pc.n_co,
             floor(pc.n_co * nb.n * 1e6 / (ia.c * ib.c) + 0.5) / 1e6
               AS lift,
             floor(pc.n_co * 1e6 / ia.c + 0.5) / 1e6 AS conf_a_to_b,
             floor(pc.n_co * 1e6 / nb.n + 0.5) / 1e6 AS support
      FROM pc
      JOIN ic ia ON ia.l_partkey = pc.part_a
      JOIN ic ib ON ib.l_partkey = pc.part_b
      CROSS JOIN nb
    )
    SELECT part_a, part_b, n_co, support, conf_a_to_b, lift
    FROM s
    ORDER BY lift DESC, part_a, part_b
    LIMIT {_AR_TOP}
    """,
)
def orders_association_rules(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Association rules over order baskets — support, confidence
    and lift per co-occurring part pair (Agrawal et al. 1993,
    "Mining Association Rules"), the step after basket_part_pairs'
    raw counting: lift > 1 ranks the genuinely-associated pairs
    for recommenders / co-purchase analysis.

    Plan: ONE basket aggregate (collect_set keyed by order) feeds
    both the pair expansion (narrow in-array, O(width^2) per order,
    width bounded by TPC-H order size) and the item counts — no
    distinct-frame self-join. The basket count is a lazy 1-row
    frame cross-join-broadcast into the plan (fixed size, no
    driver action). Item-count joins key on part — corpus-scaling
    dims, NO broadcast hint (AQE decides). Lift/confidence/support
    are exact integer rationals that can land on round() ties, so
    both engines use floor(x*1e6+0.5)/1e6; ranking is on that 6-dp
    value with the (part_a, part_b) tiebreak, one
    TakeOrderedAndProject."""
    # the basket frame feeds four branches (pairs, both item-count
    # sides, the total); r14 (guide §2.4): it is the session-shared
    # order-basket cached view (plans/shared_subtrees) — the same
    # expression basket_part_pairs starts from, computed once, and
    # the cached view already serves the four traversals (the old
    # localCheckpoint materialization is redundant over a cache)
    from open_tlm_spark.plans.shared_subtrees import shared_order_baskets

    arr = shared_order_baskets(spark, sf_dir)
    nb = arr.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ic = (
        arr.select(F.explode("parts").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)  # reused by both rule sides
    )
    pairs = arr.select(
        F.explode(
            F.expr(
                "flatten(transform(parts, (x, i) -> "
                "transform(slice(parts, i + 2, size(parts)), "
                "y -> struct(x AS part_a, y AS part_b))))"
            )
        ).alias("p")
    ).select("p.part_a", "p.part_b")
    pc = (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_co"))
        .filter(F.col("n_co") >= _AR_MIN_CO)
    )
    ia = ic.select(
        F.col("l_partkey").alias("part_a"), F.col("c").alias("c_a")
    )
    ib = ic.select(
        F.col("l_partkey").alias("part_b"), F.col("c").alias("c_b")
    )
    s = (
        pc.join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(nb))
        .select(
            "part_a",
            "part_b",
            "n_co",
            (
                F.floor(
                    F.col("n_co") * F.lit(1e6) / F.col("n") + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("support"),
            (
                F.floor(
                    F.col("n_co") * F.lit(1e6) / F.col("c_a") + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("conf_a_to_b"),
            (
                F.floor(
                    F.col("n_co") * F.col("n") * F.lit(1e6)
                    / (F.col("c_a") * F.col("c_b"))
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("lift"),
        )
    )
    return s.select(
        "part_a", "part_b", "n_co", "support", "conf_a_to_b", "lift"
    ).orderBy(F.col("lift").desc(), "part_a", "part_b").limit(_AR_TOP)


# ---------------------------------------- quantile-SAX motifs
_SAX_BIN_S = 900  # PAA frame
_SAX_ALPHA = "abcd"  # 4-symbol alphabet (quartile breakpoints)
_SAX_TOP = 3


@register(
    "ts_sax_symbols",
    oracle=f"""
    WITH binned AS (
      SELECT event_type AS dataset_id,
             CAST(floor(epoch_us(ts) / ({_SAX_BIN_S} * 1000000.0))
                  AS BIGINT) * {_SAX_BIN_S} AS bin_ts,
             CAST(round(CAST(sum(CAST(value AS DECIMAL(18,6)))
                             AS DOUBLE) / count(*), 6)
                  AS DECIMAL(18,6)) AS v
      FROM events GROUP BY 1, 2
    ),
    q AS (
      SELECT dataset_id, bin_ts,
             ntile(4) OVER (PARTITION BY dataset_id
                            ORDER BY v, bin_ts) AS qt
      FROM binned
    ),
    sym AS (
      SELECT dataset_id, bin_ts,
             substr('{_SAX_ALPHA}', qt, 1) AS s
      FROM q
    ),
    mot AS (
      SELECT dataset_id,
             s || lead(s, 1) OVER w || lead(s, 2) OVER w AS motif
      FROM sym
      WINDOW w AS (PARTITION BY dataset_id ORDER BY bin_ts)
    ),
    mc AS (
      SELECT dataset_id, motif, CAST(count(*) AS BIGINT) AS n_occ
      FROM mot WHERE motif IS NOT NULL GROUP BY 1, 2
    )
    SELECT dataset_id, motif, n_occ, rk FROM (
      SELECT *, row_number() OVER (PARTITION BY dataset_id
                 ORDER BY n_occ DESC, motif) AS rk
      FROM mc
    ) WHERE rk <= {_SAX_TOP}
    """,
)
def ts_sax_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolic series mining (Lin et al. 2003, "A Symbolic
    Representation of Time Series") with equi-depth (quantile)
    breakpoints: PAA-average each series into {_SAX_BIN_S} s frames,
    symbolize each frame into a 4-letter alphabet by within-series
    quartile, and count 3-symbol words — the top words are the
    series' recurring motifs ("aaa" = sustained low, "add" = jump).
    The standard cheap front-end for motif/novelty mining over
    telemetry.

    Plan: one (series, bin) mean aggregate; quartile assignment is
    ntile over a series-partitioned window (per-series partitions,
    never global); the word construction is two leads on the same
    window spec; then a count + per-series top-{_SAX_TOP}
    row_number. Determinism: frame means are DECIMAL-exact and
    ntile orders by (v, bin_ts) — a total order, so symbol
    assignment involves no float comparison at all (the reason for
    equi-depth rather than Gaussian breakpoints); word counts are
    integers; ranking ties break on the word itself."""
    ev = spark.table("events")
    binned = ev.groupBy(
        F.col("event_type").alias("dataset_id"),
        (
            F.floor(
                F.unix_micros("ts") / F.lit(_SAX_BIN_S * 1_000_000.0)
            ).cast("long")
            * _SAX_BIN_S
        ).alias("bin_ts"),
    ).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        )
        .cast("decimal(18,6)")
        .alias("v")
    )
    wq = Window.partitionBy("dataset_id").orderBy("v", "bin_ts")
    sym = binned.select(
        "dataset_id",
        "bin_ts",
        F.ntile(4).over(wq).alias("qt"),
    ).select(
        "dataset_id",
        "bin_ts",
        F.substring(F.lit(_SAX_ALPHA), F.col("qt"), F.lit(1)).alias("s"),
    )
    wt = Window.partitionBy("dataset_id").orderBy("bin_ts")
    mot = sym.select(
        "dataset_id",
        F.concat(
            F.col("s"), F.lead("s", 1).over(wt), F.lead("s", 2).over(wt)
        ).alias("motif"),
    ).filter(F.col("motif").isNotNull())
    mc = mot.groupBy("dataset_id", "motif").agg(
        F.count(F.lit(1)).cast("long").alias("n_occ")
    )
    wr = Window.partitionBy("dataset_id").orderBy(
        F.col("n_occ").desc(), "motif"
    )
    return (
        mc.select("*", F.row_number().over(wr).alias("rk"))
        .filter(F.col("rk") <= _SAX_TOP)
    )


# ---------------------------------------- spectral entropy
_SE_BIN_S = 600
_SE_PERIODS = (1800, 3600, 7200, 21600, 43200, 86400, 172800)
_TWO_PI = 2.0 * _math.pi
_LN_NPER = _math.log(len(_SE_PERIODS))


def _se_oracle() -> str:
    rows = ", ".join(f"({t})" for t in _SE_PERIODS)
    return f"""
    WITH binned AS (
      SELECT event_type AS dataset_id,
             CAST(floor(epoch_us(ts) / ({_SE_BIN_S} * 1000000.0))
                  AS BIGINT) * {_SE_BIN_S} AS bin_ts,
             CAST(round(CAST(sum(CAST(value AS DECIMAL(18,6)))
                             AS DOUBLE) / count(*), 6)
                  AS DECIMAL(18,6)) AS v
      FROM events GROUP BY 1, 2
    ),
    p(period_s) AS (VALUES {rows}),
    terms AS (
      SELECT dataset_id, period_s,
             CAST(round(CAST(v AS DOUBLE)
                 * cos({_TWO_PI!r} * (bin_ts % period_s) / period_s), 6)
               AS DECIMAL(18,6)) AS c,
             CAST(round(CAST(v AS DOUBLE)
                 * sin({_TWO_PI!r} * (bin_ts % period_s) / period_s), 6)
               AS DECIMAL(18,6)) AS s
      FROM binned, p
    ),
    pw AS (
      SELECT dataset_id, CAST(period_s AS BIGINT) AS period_s,
             CAST(round((CAST(sum(c) AS DOUBLE) * CAST(sum(c) AS DOUBLE)
                    + CAST(sum(s) AS DOUBLE) * CAST(sum(s) AS DOUBLE))
                   / (count(*) * CAST(count(*) AS DOUBLE)), 6)
               AS DECIMAL(18,6)) AS power
      FROM terms GROUP BY dataset_id, period_s
    ),
    tot AS (
      SELECT dataset_id, sum(power) AS tp FROM pw GROUP BY 1
    ),
    ent AS (
      SELECT pw.dataset_id,
             CAST(round(CASE WHEN CAST(pw.power AS DOUBLE) > 0
               THEN -(CAST(pw.power AS DOUBLE) / CAST(tot.tp AS DOUBLE))
                    * ln(CAST(pw.power AS DOUBLE) / CAST(tot.tp AS DOUBLE))
               ELSE 0 END, 6) AS DECIMAL(18,6)) AS term
      FROM pw JOIN tot USING (dataset_id)
    ),
    h AS (
      SELECT dataset_id,
             round(CAST(sum(term) AS DOUBLE) / {_LN_NPER!r}, 6)
               AS spectral_entropy
      FROM ent GROUP BY dataset_id
    ),
    dom AS (
      SELECT dataset_id, period_s AS dominant_period_s FROM (
        SELECT dataset_id, period_s,
               row_number() OVER (PARTITION BY dataset_id
                 ORDER BY power DESC, period_s) AS rk
        FROM pw
      ) WHERE rk = 1
    )
    SELECT h.dataset_id, h.spectral_entropy, dom.dominant_period_s
    FROM h JOIN dom USING (dataset_id)
    """


@register("ts_spectral_entropy", oracle=_se_oracle())
def ts_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized spectral entropy over a fixed 7-period DFT grid
    (30 min .. 2 d) plus the dominant period — the single-number
    "how periodic is this series" feature (H near 0 = one clean
    period, near 1 = white noise) used for forecastability scoring
    (Goerg 2013 / tsfeatures' spectral entropy, public), on top of
    the same Schuster periodogram as ts_dft_power.

    Plan: one (series, bin) mean aggregate, a 7-row period-spec
    cross join (fixed-size literal frame), a (series, period)
    aggregate, then two series-level aggregates (entropy sum,
    argmax via row_number) joined on series — every stage map-side
    combinable or per-series windows. Determinism: powers are 6-dp
    DECIMAL (built from rounded DECIMAL-summed cos/sin terms), the
    power fraction divides two exact values, each -p ln p term is
    rounded then DECIMAL-summed, and ln(7) is embedded as the same
    Python double literal in both engines; argmax ties break on the
    shorter period."""
    ev = spark.table("events")
    binned = ev.groupBy(
        F.col("event_type").alias("dataset_id"),
        (
            F.floor(
                F.unix_micros("ts") / F.lit(_SE_BIN_S * 1_000_000.0)
            ).cast("long")
            * _SE_BIN_S
        ).alias("bin_ts"),
    ).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        )
        .cast("decimal(18,6)")
        .alias("v")
    )
    periods = spark.createDataFrame(
        [(t,) for t in _SE_PERIODS], "period_s long"
    )
    theta = (
        F.lit(_TWO_PI)
        * (F.col("bin_ts") % F.col("period_s"))
        / F.col("period_s")
    )
    terms = binned.join(F.broadcast(periods)).select(
        "dataset_id",
        "period_s",
        F.round(F.col("v").cast("double") * F.cos(theta), 6)
        .cast("decimal(18,6)")
        .alias("c"),
        F.round(F.col("v").cast("double") * F.sin(theta), 6)
        .cast("decimal(18,6)")
        .alias("s"),
    )
    sc = F.sum("c").cast("double")
    ss = F.sum("s").cast("double")
    n = F.count(F.lit(1))
    pw = terms.groupBy("dataset_id", "period_s").agg(
        F.round((sc * sc + ss * ss) / (n * n.cast("double")), 6)
        .cast("decimal(18,6)")
        .alias("power")
    ).localCheckpoint(eager=False)  # feeds tot/ent/dom — one DFT pass
    tot = pw.groupBy("dataset_id").agg(F.sum("power").alias("tp"))
    frac = F.col("power").cast("double") / F.col("tp").cast("double")
    ent = pw.join(tot, "dataset_id").select(
        "dataset_id",
        F.round(
            F.when(
                F.col("power").cast("double") > 0, -frac * F.log(frac)
            ).otherwise(F.lit(0.0)),
            6,
        )
        .cast("decimal(18,6)")
        .alias("term"),
    )
    h = ent.groupBy("dataset_id").agg(
        F.round(
            F.sum("term").cast("double") / F.lit(_LN_NPER), 6
        ).alias("spectral_entropy")
    )
    wr = Window.partitionBy("dataset_id").orderBy(
        F.col("power").desc(), "period_s"
    )
    dom = (
        pw.select(
            "dataset_id",
            "period_s",
            F.row_number().over(wr).alias("rk"),
        )
        .filter(F.col("rk") == 1)
        .select(
            "dataset_id", F.col("period_s").alias("dominant_period_s")
        )
    )
    return h.join(dom, "dataset_id").select(
        "dataset_id", "spectral_entropy", "dominant_period_s"
    )


# ---------------------------------------- shard balance audit
_N_SHARDS = 16


@register(
    "shards_assignment_balance",
    oracle=rf"""
    WITH {_TOKS_CTE},
    d AS (
      SELECT doc_id, source, len(w) AS n_tok,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % {_N_SHARDS} AS shard
      FROM toks
    ),
    sh AS (
      SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS n_tokens
      FROM d GROUP BY 1
    ),
    ss AS (
      SELECT shard, source, CAST(count(*) AS BIGINT) AS c
      FROM d GROUP BY 1, 2
    ),
    sc AS (
      SELECT source, CAST(count(*) AS BIGINT) AS c_src
      FROM d GROUP BY 1
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
    grid AS (
      SELECT sh.shard, sh.n_docs, sc.source, sc.c_src
      FROM sh CROSS JOIN sc
    ),
    chi AS (
      SELECT g.shard,
             round((coalesce(ss.c, 0)
                    - g.n_docs * g.c_src / CAST(tot.n AS DOUBLE))
                   * (coalesce(ss.c, 0)
                    - g.n_docs * g.c_src / CAST(tot.n AS DOUBLE))
                   / (g.n_docs * g.c_src / CAST(tot.n AS DOUBLE)), 6)
               AS term
      FROM grid g
      LEFT JOIN ss ON ss.shard = g.shard AND ss.source = g.source
      CROSS JOIN tot
    ),
    c2 AS (
      SELECT shard,
             CAST(sum(CAST(term AS DECIMAL(18,6))) AS DOUBLE)
               AS chi2_source
      FROM chi GROUP BY shard
    )
    SELECT sh.shard, sh.n_docs, sh.n_tokens, c2.chi2_source
    FROM sh JOIN c2 USING (shard)
    """,
)
def shards_assignment_balance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Deterministic training-shard assignment + balance audit:
    hash each document into {_N_SHARDS} shards (the data-loader
    sharding a distributed training job does), then audit per-shard
    document count, token count, and a chi-squared statistic of the
    shard's source mix against the global mix — the check that says
    whether hash sharding gave every worker the same data
    distribution (skewed shards = biased gradient steps).

    Plan: ONE tokenize pass produces (doc, source, n_tok, shard);
    shard totals, shard x source counts and source marginals all
    aggregate from it (map-side combinable). The expected-count
    grid is shards x sources — shard count is a FIXED {_N_SHARDS}
    constant, so the grid scales only with the source dimension and
    joins unhinted (AQE decides). Chi-squared terms are rounded to
    6 dp and DECIMAL-summed per shard (order-free); expected counts
    divide exact integers in both engines."""
    from open_tlm_spark.operators.text import tokens

    docs = fan_out(spark.table("documents"))
    d = docs.select(
        "doc_id",
        "source",
        F.size(tokens(F.lower(F.col("text")))).alias("n_tok"),
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("long")
            % _N_SHARDS
        ).alias("shard"),
    ).localCheckpoint(eager=False)  # feeds 4 aggregates — tokenize once
    sh = d.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
    )
    ss = d.groupBy("shard", "source").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    sc_ = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("c_src")
    )
    tot = d.agg(F.count(F.lit(1)).cast("long").alias("n"))
    # the shard-totals side is a FIXED _N_SHARDS-row frame — its
    # broadcast is size-independent (the source dim side stays
    # unhinted and scales freely)
    grid = sc_.crossJoin(F.broadcast(sh.select("shard", "n_docs")))
    exp = F.col("n_docs") * F.col("c_src") / F.col("n").cast("double")
    obs = F.coalesce(F.col("c"), F.lit(0))
    chi = (
        grid.join(ss, ["shard", "source"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "shard",
            F.round((obs - exp) * (obs - exp) / exp, 6).alias("term"),
        )
    )
    c2 = chi.groupBy("shard").agg(
        F.sum(F.col("term").cast("decimal(18,6)"))
        .cast("double")
        .alias("chi2_source")
    )
    return sh.join(c2, "shard").select(
        "shard", "n_docs", "n_tokens", "chi2_source"
    )


# ---------------------------------------- Theil-Sen robust trend
_TS_NB = 48  # fixed bucket grid per series


@register(
    "ts_theil_sen_slope",
    oracle=f"""
    WITH e AS (
      SELECT event_type AS dataset_id, epoch_us(ts) AS us, value
      FROM events
    ),
    mm AS (SELECT min(us) AS lo, max(us) AS hi FROM e),
    bb AS (
      SELECT dataset_id,
             CAST(floor((us - lo) * {_TS_NB}.0 / (hi - lo + 1))
                  AS BIGINT) AS b,
             value
      FROM e, mm
    ),
    bm AS (
      SELECT dataset_id, b,
             CAST(round(CAST(sum(CAST(value AS DECIMAL(18,6)))
                             AS DOUBLE) / count(*), 6)
                  AS DECIMAL(18,6)) AS v
      FROM bb GROUP BY 1, 2
    ),
    sl AS (
      SELECT a.dataset_id,
             CAST(b2.v - a.v AS DOUBLE) / (b2.b - a.b) AS slope
      FROM bm a JOIN bm b2
        ON b2.dataset_id = a.dataset_id AND b2.b > a.b
    ),
    med AS (
      SELECT dataset_id,
             CAST(count(*) AS BIGINT) AS n_pairs,
             round(median(slope), 6) AS theil_sen_slope
      FROM sl GROUP BY dataset_id
    ),
    ols AS (
      SELECT dataset_id,
             CAST(count(*) AS BIGINT) AS n_buckets,
             round((count(*) * CAST(sum(CAST(v AS DECIMAL(28,6)) * b)
                                    AS DOUBLE)
                    - CAST(sum(b) AS DOUBLE)
                      * CAST(sum(CAST(v AS DECIMAL(28,6))) AS DOUBLE))
                   / nullif(count(*) * CAST(sum(b * b) AS DOUBLE)
                    - CAST(sum(b) AS DOUBLE) * CAST(sum(b) AS DOUBLE),
                     0), 6) AS ols_slope
      FROM bm GROUP BY dataset_id
    )
    SELECT med.dataset_id, ols.n_buckets, med.n_pairs,
           med.theil_sen_slope, ols.ols_slope
    FROM med JOIN ols USING (dataset_id)
    """,
)
def ts_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend estimate per series (Theil 1950 / Sen
    1968: the median of all pairwise slopes — 29% breakdown point,
    immune to the outliers that wreck OLS), computed on a FIXED
    {_TS_NB}-bucket time grid, reported next to the OLS slope so
    the divergence itself flags outlier contamination.

    Plan: the fixed grid is the scale story — bucketing first means
    the pairwise stage is {_TS_NB}*{_TS_NB}/2 rows per series
    REGARDLESS of corpus size (never a points x points self-join);
    the grid bounds come from a lazy 1-row min/max frame
    cross-join-broadcast into the plan (fixed size, no driver
    action). Bucket means are DECIMAL-exact; each slope divides an
    exact 6-dp difference by an integer gap, so both engines see
    bit-identical doubles; the median (exact, interpolated) and the
    OLS normal-equation slope (DECIMAL-exact sums, one final double
    division, nullif-guarded denominator) then agree exactly."""
    ev = spark.table("events").select(
        F.col("event_type").alias("dataset_id"),
        F.unix_micros("ts").alias("us"),
        "value",
    )
    mm = ev.agg(F.min("us").alias("lo"), F.max("us").alias("hi"))
    bb = ev.crossJoin(F.broadcast(mm)).select(
        "dataset_id",
        F.floor(
            (F.col("us") - F.col("lo"))
            * F.lit(float(_TS_NB))
            / (F.col("hi") - F.col("lo") + F.lit(1))
        )
        .cast("long")
        .alias("b"),
        "value",
    )
    bm = bb.groupBy("dataset_id", "b").agg(
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        )
        .cast("decimal(18,6)")
        .alias("v")
    ).localCheckpoint(eager=False)  # feeds both pair sides + OLS
    a = bm.select(
        "dataset_id", F.col("b").alias("b1"), F.col("v").alias("v1")
    )
    b2 = bm.select(
        "dataset_id", F.col("b").alias("b2"), F.col("v").alias("v2")
    )
    sl = a.join(b2, "dataset_id").filter(F.col("b2") > F.col("b1")).select(
        "dataset_id",
        (
            (F.col("v2") - F.col("v1")).cast("double")
            / (F.col("b2") - F.col("b1"))
        ).alias("slope"),
    )
    med = sl.groupBy("dataset_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.percentile("slope", F.lit(0.5)), 6).alias(
            "theil_sen_slope"
        ),
    )
    n = F.count(F.lit(1))
    sb = F.sum("b").cast("double")
    sv = F.sum(F.col("v").cast("decimal(28,6)")).cast("double")
    sbb = F.sum(F.col("b") * F.col("b")).cast("double")
    sbv = F.sum(F.col("v").cast("decimal(28,6)") * F.col("b")).cast(
        "double"
    )
    ols = bm.groupBy("dataset_id").agg(
        n.cast("long").alias("n_buckets"),
        F.round(
            (n * sbv - sb * sv) / F.nullif(n * sbb - sb * sb, F.lit(0.0)),
            6,
        ).alias("ols_slope"),
    )
    return med.join(ols, "dataset_id").select(
        "dataset_id",
        "n_buckets",
        "n_pairs",
        "theil_sen_slope",
        "ols_slope",
    )


# ---------------------------------------- k-anonymity audit
_KA_BAND_CENTS = 100_000  # $1000 account-balance bands


@register(
    "customers_kanonymity_audit",
    oracle=f"""
    WITH c AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(CAST(round(c_acctbal * 100, 0) AS BIGINT)
                        / {_KA_BAND_CENTS}.0) AS BIGINT) AS bal_band
      FROM customer
    ),
    g AS (
      SELECT c_nationkey, c_mktsegment, bal_band,
             CAST(count(*) AS BIGINT) AS k
      FROM c GROUP BY 1, 2, 3
    ),
    tot AS (SELECT CAST(sum(k) AS BIGINT) AS n FROM g),
    kb AS (
      SELECT CASE WHEN k = 1 THEN '1=unique'
                  WHEN k < 5 THEN '2-4'
                  WHEN k < 20 THEN '5-19'
                  ELSE '20+' END AS k_bucket,
             k
      FROM g
    )
    SELECT k_bucket,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(k) AS BIGINT) AS n_rows,
           floor(CAST(sum(k) AS BIGINT) * 1e6 / tot.n + 0.5) / 1e6
             AS frac_rows
    FROM kb CROSS JOIN tot
    GROUP BY k_bucket, tot.n
    """,
)
def customers_kanonymity_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """k-anonymity audit over the customer quasi-identifier
    (nation, market segment, $1000 account-balance band) — the
    group-size histogram (Sweeney 2002, "k-anonymity: a model for
    protecting privacy"): rows in k=1 groups are re-identifiable
    from the quasi-identifier alone, the standard governance check
    before a dataset (or its aggregates) is released for training.

    Plan: one group-by over the quasi-identifier then a 4-bucket
    histogram of group sizes — two map-side-combinable aggregates,
    no window, no sort (the balance band is arithmetic banding, not
    a global ntile, precisely so no single-partition window
    appears). The row total is a lazy 1-row frame
    cross-join-broadcast. Determinism: the 2-dp balance goes
    through round(x*100)::BIGINT integer cents before banding
    (float-representation-proof), counts are integers, and the row
    fraction uses floor(x*1e6+0.5)/1e6."""
    c = spark.table("customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(
            F.round(F.col("c_acctbal") * 100, 0).cast("long")
            / F.lit(float(_KA_BAND_CENTS))
        )
        .cast("long")
        .alias("bal_band"),
    )
    g = c.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    ).localCheckpoint(eager=False)  # feeds the total AND the histogram
    tot = g.agg(F.sum("k").cast("long").alias("n"))
    kb = g.select(
        F.when(F.col("k") == 1, "1=unique")
        .when(F.col("k") < 5, "2-4")
        .when(F.col("k") < 20, "5-19")
        .otherwise("20+")
        .alias("k_bucket"),
        "k",
    )
    return (
        kb.crossJoin(F.broadcast(tot))
        .groupBy("k_bucket", "n")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum("k").cast("long").alias("n_rows"),
        )
        .select(
            "k_bucket",
            "n_groups",
            "n_rows",
            (
                F.floor(
                    F.col("n_rows") * F.lit(1e6) / F.col("n") + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("frac_rows"),
        )
    )
