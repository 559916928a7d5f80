"""Vector-compression and semantic-dedup gate queries: product
quantization (the IVF-PQ memory-side half of ANN at corpus scale) and
SemDeDup-style cell-blocked embedding dedup.

Both use DETERMINISTIC codebooks/centroids (the k lowest vec_ids) so
the assignment step itself is oracle-gated end to end; production
swaps in kmeans_train (operators/similarity.py — the sim_ivf_train
query) without touching the assignment plans, which is the part that
runs over the 100 TB side.

Cross-engine float determinism (registry docstring conventions):
distances/cosines are left-fold accumulations over double-cast
elements, ROUNDED to 6 dp before any argmin/argmax, and arg-selection
is an integer key  round(metric*1e6)*100 + id  so ties break on the
id identically in both engines with pure integer min().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from open_tlm_spark.operators import similarity as S
from open_tlm_spark.plans.registry import register
from open_tlm_spark.session import fan_out

_DIM = 64
_PQ_M = 8  # subspaces
_PQ_DSUB = _DIM // _PQ_M
_PQ_K = 8  # codewords per subspace
_SEM_K = 8  # semantic-dedup cells
_SEM_TAU = 0.35


# ---------------------------------------------------------------- PQ
# Shared oracle CTE chain: raw vectors -> deterministic codebook ->
# per-(vector, subspace) integer-key argmin assignment (`best`).
# Reused verbatim by the pq_quantize and sim_pq_adc_topk oracles so
# both gates pin the SAME assignment semantics.
_PQ_BEST_CTES = f"""
    v AS (
      SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
    ),
    cb AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code_id, vec
      FROM (SELECT vec_id, vec FROM v ORDER BY vec_id LIMIT {_PQ_K})
    ),
    sc AS (
      SELECT t.vec_id, s.sub, c.code_id,
             CAST(round(round(list_sum(list_transform(
                 range(1, {_PQ_DSUB} + 1),
                 j -> (t.vec[s.sub * {_PQ_DSUB} + j]
                       - c.vec[s.sub * {_PQ_DSUB} + j])
                      * (t.vec[s.sub * {_PQ_DSUB} + j]
                         - c.vec[s.sub * {_PQ_DSUB} + j]))), 6)
               * 1000000) AS BIGINT) * 100 + c.code_id AS ikey
      FROM v t, UNNEST(range(0, {_PQ_M})) s(sub), cb c
    ),
    best AS (
      SELECT vec_id, sub, min(ikey) AS ik
      FROM sc GROUP BY vec_id, sub
    )
"""


def _pq_subs(frame: DataFrame, out: str) -> DataFrame:
    """Explode a (..., vec) frame into one row per subspace with the
    sliced subvector as `out` — narrow, no shuffle."""
    structs = F.array(
        *[
            F.struct(
                F.lit(s).alias("sub"),
                F.slice("vec", s * _PQ_DSUB + 1, _PQ_DSUB).alias("sv"),
            )
            for s in range(_PQ_M)
        ]
    )
    return frame.select(
        *[c for c in frame.columns if c != "vec"],
        F.explode(structs).alias("_e"),
    ).select(
        *[c for c in frame.columns if c != "vec"],
        F.col("_e.sub").alias("sub"),
        F.col("_e.sv").alias(out),
    )


def _sq_dist(a: str, b: str) -> "F.Column":
    """Left-associated squared-L2 chain over two subvector columns —
    the same op order as the oracle's list_sum fold."""
    terms = [
        (F.element_at(a, j + 1) - F.element_at(b, j + 1))
        * (F.element_at(a, j + 1) - F.element_at(b, j + 1))
        for j in range(_PQ_DSUB)
    ]
    dist = terms[0]
    for t in terms[1:]:
        dist = dist + t
    return dist


def _pq_parts(spark: SparkSession, sf_dir: str | None = None):
    """(vsub, csub, best): subvector relation, broadcastable codebook
    subspaces, and the per-(vector, subspace) assignment — the Spark
    mirror of _PQ_BEST_CTES.

    With `sf_dir` given, `best` (the expensive scored-join argmin
    over corpus x codebook rows) is the session-shared cached view
    (r13, plans/shared_subtrees pattern): four gates — pq_quantize,
    sim_pq_adc_topk, sim_ivfpq_topk, sim_pq_recall_eval — read the
    SAME per-(vector, subspace) assignment, exactly the PQ-code
    artifact an IVF-PQ index persists once per corpus snapshot."""
    emb = fan_out(spark.table("embeddings")).select(
        "vec_id", S.as_double(F.col("embedding")).alias("vec")
    )
    w = Window.orderBy("vec_id")
    cb = (
        emb.orderBy("vec_id")
        .limit(_PQ_K)
        .select((F.row_number().over(w) - 1).alias("code_id"), "vec")
    )
    vsub = _pq_subs(emb, "sv")
    csub = _pq_subs(cb, "cv")
    ikey = (
        F.round(F.round(_sq_dist("sv", "cv"), 6) * 1_000_000).cast("long")
        * 100
        + F.col("code_id")
    )

    def build_best() -> DataFrame:
        return (
            vsub.join(F.broadcast(csub), "sub")
            .select("vec_id", "sub", ikey.alias("ikey"))
            .groupBy("vec_id", "sub")
            .agg(F.min("ikey").alias("ik"))
        )

    if sf_dir is None:
        return vsub, csub, build_best()
    from open_tlm_spark.operators.shared_cache import shared_view

    return vsub, csub, shared_view(spark, "pq_best", sf_dir, build_best)


def _pq_oracle() -> str:
    return f"""
    WITH {_PQ_BEST_CTES}
    SELECT vec_id,
           string_agg(CAST(ik % 100 AS VARCHAR), '-' ORDER BY sub)
             AS pq_code,
           round(CAST(sum(ik // 100) AS BIGINT) / 1000000.0, 6)
             AS quant_err
    FROM best GROUP BY vec_id
    """


@register("pq_quantize", oracle=_pq_oracle())
def pq_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (Jégou et al., 'Product Quantization for
    Nearest Neighbor Search', TPAMI 2011 — public technique): split
    each {_DIM}-dim vector into {_PQ_M} subvectors, snap each to its
    nearest of {_PQ_K} subspace codewords, and emit the code plus the
    total squared reconstruction error. PQ codes are what an IVF-PQ
    index stores per vector ({_PQ_M} bytes instead of {_DIM * 4}) —
    the memory-side half of corpus-scale ANN, next to the IVF routing
    half (sim_ivf_assign/sim_ivf_topk).

    Plan: codebook is a {_PQ_M * _PQ_K}-row broadcast; the corpus side
    is ONE narrow explode into (vec, subspace) rows joined against it
    (no shuffle until the per-vector reassembly aggregate, which is
    map-side combinable). Distances are 6-dp-rounded and packed with
    the codeword id into one integer key, so argmin is a plain min()
    with deterministic id tiebreaks in both engines.
    """
    _, _, best = _pq_parts(spark, sf_dir)
    code = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("sub", (F.col("ik") % 100).alias("c")))
            ),
            lambda s: s["c"].cast("string"),
        ),
        "-",
    )
    return best.groupBy("vec_id").agg(
        code.alias("pq_code"),
        F.round(F.sum(F.expr("ik div 100")) / F.lit(1_000_000.0), 6).alias(
            "quant_err"
        ),
    )


# ------------------------------------------------------ SemDeDup
_NORMED_CTE = f"""
    v AS (
      SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
    ),
    normed AS (
      SELECT vec_id, list_transform(vec, x -> x / n) AS nvec
      FROM (SELECT vec_id, vec,
                   sqrt(list_sum(list_transform(range(1, {_DIM + 1}),
                                 i -> vec[i] * vec[i]))) AS n
            FROM v))
"""

_COS = (
    f"round(list_sum(list_transform(range(1, {_DIM + 1}), "
    "i -> {a}.nvec[i] * {b}.nvec[i])), 6)"
)


def _sem_oracle() -> str:
    cos_nc = _COS.format(a="n", b="c")
    cos_ab = _COS.format(a="a", b="b")
    return f"""
    WITH {_NORMED_CTE},
    cent AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
             nvec
      FROM (SELECT vec_id, nvec FROM normed ORDER BY vec_id
            LIMIT {_SEM_K})
    ),
    sc AS (
      SELECT n.vec_id,
             CAST(round((1 - {cos_nc}) * 1000000) AS BIGINT) * 100
               + c.cell AS skey
      FROM normed n, cent c
    ),
    asg AS (
      SELECT vec_id, CAST(min(skey) % 100 AS INTEGER) AS cell
      FROM sc GROUP BY vec_id
    ),
    j AS (
      SELECT a.vec_id, a.cell, n.nvec
      FROM asg a JOIN normed n USING (vec_id)
    ),
    dropped AS (
      SELECT DISTINCT b.vec_id AS vec_id
      FROM j a JOIN j b ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE {cos_ab} >= {_SEM_TAU}
    )
    SELECT j.vec_id, j.cell, d.vec_id IS NULL AS is_kept
    FROM j LEFT JOIN dropped d ON d.vec_id = j.vec_id
    """


@register("sem_dedup_cells", oracle=_sem_oracle())
def sem_dedup_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al., 'SemDeDup', 2023
    — public technique): cluster the embedding space, then drop any
    vector with a higher-priority near-identical neighbor (cosine >=
    {_SEM_TAU}) in ITS OWN cell — pairwise cost O(sum cell²), never
    O(n²), and unlike label blocking the cells come from the data.
    Centroids here are the {_SEM_K} lowest vec_ids (deterministic, so
    assignment is oracle-gated); production swaps kmeans_train
    centroids into the identical plan.

    Plan: normalize once; assignment is a broadcast cross-join +
    integer-key min (the pq_quantize argmin pattern); within-cell
    scoring reuses the Arrow block kernel (blocked_cosine_pairs) that
    ships each vector once per cell.
    """
    from open_tlm_spark.plans.shared_subtrees import shared_normed_embeddings

    nv = shared_normed_embeddings(spark, sf_dir)
    w = Window.orderBy("vec_id")
    cent = (
        nv.orderBy("vec_id")
        .limit(_SEM_K)
        .select(
            (F.row_number().over(w) - 1).alias("cell"),
            F.col("nvec").alias("cnvec"),
        )
    )
    rcos = F.round(S.dot(F.col("nvec"), F.col("cnvec")), 6)
    skey = (
        F.round((F.lit(1) - rcos) * 1_000_000).cast("long") * 100
        + F.col("cell")
    )
    asg = (
        nv.join(F.broadcast(cent))
        .select("vec_id", skey.alias("skey"))
        .groupBy("vec_id")
        .agg((F.min("skey") % 100).cast("int").alias("cell"))
    )
    j = asg.join(nv, "vec_id")
    pairs = S.blocked_cosine_pairs(j, "cell", "vec_id", "nvec", _SEM_TAU)
    dropped = pairs.select(F.col("vec_b").alias("vec_id")).distinct()
    d = dropped.withColumn("_hit", F.lit(1))
    return (
        j.join(d, "vec_id", "left")
        .select("vec_id", "cell", F.col("_hit").isNull().alias("is_kept"))
    )


# ------------------------------------------------- per-dim stats
@register(
    "embedding_dim_stats",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
    ),
    e AS (
      SELECT i.i AS dim, vec[i.i] AS x
      FROM v, UNNEST(range(1, {_DIM + 1})) i(i)
    ),
    s AS (
      SELECT dim,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(x AS DECIMAL(18,6))) AS s1,
             sum(CAST(CAST(x AS DECIMAL(18,6))
                      * CAST(x AS DECIMAL(18,6)) AS DECIMAL(38,12))) AS s2,
             min(x) AS vmin,
             max(x) AS vmax
      FROM e GROUP BY dim
    )
    SELECT dim, n,
           round(CAST(s1 AS DOUBLE) / n, 6) AS mean,
           round(sqrt((CAST(s2 AS DOUBLE)
                       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                      / (n - 1)), 6) AS stddev,
           vmin, vmax
    FROM s
    """,
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding moments (mean / sample stddev / min /
    max) — the whitening + collapsed-dimension diagnostic run before
    trusting a vector column for ANN or dedup (a dimension with ~zero
    variance is dead weight in every distance; a shifted mean breaks
    cosine vs dot-product assumptions). One narrow posexplode and ONE
    hash aggregate keyed by dimension — {_DIM} groups regardless of
    corpus size, map-side combinable, so the shuffle carries {_DIM}
    partial rows per task at any scale. Moments are DECIMAL-exact
    sums (order-independent); the variance formula is applied to the
    exact sums identically in both engines."""
    emb = fan_out(spark.table("embeddings")).select(
        "vec_id", S.as_double(F.col("embedding")).alias("vec")
    )
    e = emb.select(F.posexplode("vec").alias("pos", "x")).select(
        (F.col("pos") + 1).cast("long").alias("dim"), "x"
    )
    xd = F.col("x").cast("decimal(18,6)")
    s = e.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).alias("s1"),
        F.sum((xd * xd).cast("decimal(38,12)")).alias("s2"),
        F.min("x").alias("vmin"),
        F.max("x").alias("vmax"),
    )
    s1d, s2d = F.col("s1").cast("double"), F.col("s2").cast("double")
    n = F.col("n")
    return s.select(
        "dim",
        "n",
        F.round(s1d / n, 6).alias("mean"),
        F.round(F.sqrt((s2d - s1d * s1d / n) / (n - 1)), 6).alias("stddev"),
        "vmin",
        "vmax",
    )


# ------------------------------------------------------ PQ ADC search
_ADC_NQ = 5  # query set: lowest vec_ids (sim_* convention)
_ADC_K = 5


# ADC top-k as a reusable CTE chain over _PQ_BEST_CTES (the recall
# eval composes it against a brute-force ground truth).
_ADC_TOPK_CTES = f"""
    codes AS (
      SELECT vec_id, sub, CAST(ik % 100 AS BIGINT) AS code FROM best
    ),
    q AS (SELECT vec_id AS query_id, vec FROM v WHERE vec_id < {_ADC_NQ}),
    lut AS (
      SELECT q.query_id, s.sub, c.code_id,
             CAST(round(list_sum(list_transform(
                 range(1, {_PQ_DSUB} + 1),
                 j -> (q.vec[s.sub * {_PQ_DSUB} + j]
                       - c.vec[s.sub * {_PQ_DSUB} + j])
                      * (q.vec[s.sub * {_PQ_DSUB} + j]
                         - c.vec[s.sub * {_PQ_DSUB} + j]))), 6)
               AS DECIMAL(18,6)) AS d
      FROM q, UNNEST(range(0, {_PQ_M})) s(sub), cb c
    ),
    sc2 AS (
      SELECT l.query_id, t.vec_id, sum(l.d) AS dist
      FROM codes t JOIN lut l ON l.sub = t.sub AND l.code_id = t.code
      WHERE t.vec_id <> l.query_id
      GROUP BY 1, 2
    ),
    adc AS (
      SELECT query_id, vec_id, adc_dist, rank FROM (
        SELECT query_id, vec_id, CAST(dist AS DOUBLE) AS adc_dist,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY dist, vec_id) AS rank
        FROM sc2
      ) WHERE rank <= {_ADC_K}
    )
"""


def _adc_oracle() -> str:
    return f"""
    WITH {_PQ_BEST_CTES},
    {_ADC_TOPK_CTES}
    SELECT query_id, vec_id, adc_dist, rank FROM adc
    """


@register("sim_pq_adc_topk", oracle=_adc_oracle())
def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric distance computation (ADC) top-k over PQ codes
    (Jégou et al. 2011, §IV — public technique): per query, build the
    m×k lookup table of exact query-subvector-to-codeword distances,
    then score every corpus vector by summing the LUT entries its
    code selects — the serving-side half of IVF-PQ, scanning
    {_PQ_M}-byte codes instead of {_DIM * 4}-byte vectors (32x less
    I/O at corpus scale).

    Plan: codes come from the SAME assignment subtree pq_quantize
    gates; the LUT (nq x m x k rows) broadcasts; scoring is one
    map-side-combinable aggregate keyed (query, vector) over DECIMAL
    distances (order-independent exact sums), then a per-query
    top-{_ADC_K} window. At 100 TB the aggregate's shuffle carries at
    most one partial row per (query, vector) per partition, and the
    window input is already reduced to nq x corpus rows."""
    vsub, csub, best = _pq_parts(spark, sf_dir)
    codes = best.select("vec_id", "sub", (F.col("ik") % 100).alias("code"))
    qsub = vsub.filter(F.col("vec_id") < _ADC_NQ).select(
        F.col("vec_id").alias("query_id"), "sub", F.col("sv").alias("qv")
    )
    lut = (
        qsub.join(F.broadcast(csub.withColumnRenamed("cv", "cv2")), "sub")
        .withColumnRenamed("cv2", "cv")
        .select(
            "query_id",
            "sub",
            "code_id",
            F.round(_sq_dist("qv", "cv"), 6).cast("decimal(18,6)").alias("d"),
        )
    )
    sc = (
        codes.join(
            F.broadcast(lut),
            (codes.sub == lut.sub)
            & (codes.code == lut.code_id)
            & (codes.vec_id != lut.query_id),
        )
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d").alias("dist"))
    )
    w = Window.partitionBy("query_id").orderBy("dist", "vec_id")
    return (
        sc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _ADC_K)
        .select(
            "query_id",
            "vec_id",
            F.col("dist").cast("double").alias("adc_dist"),
            "rank",
        )
    )
