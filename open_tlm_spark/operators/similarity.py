"""Similarity search over embedding columns (array<float>).

Driver north-star operators: brute-force cosine top-k as the exact
baseline, and an IVF (inverted-file) cell-probed variant as the scale
path — both pure DataFrame ops.

Determinism for the oracle: vectors are cast to double element-wise
before any arithmetic (float*float would round differently across
engines), dot products are sequential folds, and ranking uses the
ROUNDED score plus vec_id as tiebreak on both sides.

Scale notes (100 TB of vectors):
  * brute-force — queries broadcast against the corpus; per-partition
    top-k then global top-k (TakeOrderedAndProject after a window
    rank). Cost is one full scan per query batch: right for recall
    evaluation, wrong as a serving path.
  * IVF — corpus pre-assigned to nearest centroid (one narrow pass,
    persisted); a query probes only its cell(s), cutting the scan by
    ~n_cells. Centroid count scales with sqrt(corpus); here centroids
    are a deterministic sample (lowest vec_ids) so the oracle can
    reproduce the assignment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential fold over zip_with products — deterministic order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def normalized(df: DataFrame, vec_col: str, out_col: str = "nvec") -> DataFrame:
    """Add an L2-normalized copy of `vec_col` (computed ONCE per
    vector). Every pairwise score then costs a single dot-product
    fold instead of dot + two norms — 3x fewer interpreted fold
    passes in the pairwise stage, and at corpus scale the normalized
    column is what you persist."""
    tmp = df.withColumn("_norm", norm(F.col(vec_col)))
    return tmp.withColumn(
        out_col, F.transform(F.col(vec_col), lambda x: x / F.col("_norm"))
    ).drop("_norm")


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k for each query vector.

    embeddings: (vec_id, embedding); queries: (query_id, query_vec).
    Both sides pre-normalized (cosine == dot of unit vectors);
    queries are broadcast (small side); rank via window on
    (rounded score desc, vec_id) for a deterministic result set.
    """
    e = normalized(
        embeddings.select("vec_id", as_double(F.col("embedding")).alias("vec")), "vec"
    ).select("vec_id", "nvec")
    q = normalized(
        queries.select("query_id", as_double(F.col("query_vec")).alias("vec")), "vec"
    ).select("query_id", F.col("nvec").alias("qvec"))
    scored = e.join(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        "vec_id",
        F.round(dot(F.col("qvec"), F.col("nvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def ivf_assign(embeddings: DataFrame, centroids: DataFrame) -> DataFrame:
    """Assign each vector to its nearest centroid by cosine
    (deterministic argmax: max (rounded cos, -centroid_id) struct).

    centroids: (centroid_id, cvec). Broadcast; one narrow pass.
    """
    e = normalized(
        embeddings.select("vec_id", as_double(F.col("embedding")).alias("vec")), "vec"
    )
    c = normalized(
        centroids.select("centroid_id", as_double(F.col("cvec")).alias("vec")), "vec"
    ).select("centroid_id", F.col("nvec").alias("cnvec"))
    scored = e.join(F.broadcast(c)).select(
        "vec_id",
        "vec",
        "centroid_id",
        F.round(dot(F.col("nvec"), F.col("cnvec")), 6).alias("cs"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cs").desc(), F.col("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "vec", "centroid_id")
    )
