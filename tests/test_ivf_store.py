"""Persisted IVF index (operators/ivf_store.py): serving from the
parquet artifacts matches the direct computation exactly, reloads
serve without retraining, and the cell-partitioned layout actually
prunes at probe time."""

import pytest
from pyspark.sql import functions as F

from open_tlm_spark.operators.ivf_store import IVFIndex
from open_tlm_spark.operators.similarity import as_double, ivf_topk
from open_tlm_spark.session import load_tables

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    load_tables(spark, SF)
    emb = spark.table("embeddings")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"),
        as_double(F.col("embedding")).alias("cvec"),
    )
    path = str(tmp_path_factory.mktemp("ivf") / "index")
    idx = IVFIndex.build(spark, emb, path, centroids=centroids)
    return idx, emb, path


def _rows(df):
    return {
        (r.query_id, r.vec_id, r.cos_sim, r.rank) for r in df.collect()
    }


def test_store_matches_direct_topk(spark, built):
    """Persistence must be invisible: same results as similarity.
    ivf_topk computed straight from the corpus frame."""
    idx, emb, _ = built
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("cvec"),
    )
    queries = emb.filter(
        (F.col("vec_id") >= 8) & (F.col("vec_id") < 12)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    want = _rows(ivf_topk(emb, centroids, queries, k=5))
    got = _rows(idx.topk(queries, k=5))
    assert got == want and len(got) == 20


def test_reload_serves_without_rebuild(spark, built):
    """A fresh IVFIndex handle on the same path serves identically —
    the artifacts ARE the index; no training state lives in the
    object."""
    idx, emb, path = built
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    reloaded = IVFIndex(spark, path)
    assert reloaded.exists()
    assert _rows(reloaded.topk(queries, k=3)) == _rows(
        idx.topk(queries, k=3)
    )


def test_probe_prunes_to_queried_cells(spark, built):
    """The 100 TB contract: with the assignments partitioned by
    centroid_id, a probe's scan must carry a PartitionFilters entry on
    centroid_id (dynamic pruning from the cell join) OR read only the
    queried cell's files — never a full-corpus scan per query."""
    idx, emb, _ = built
    queries = emb.filter(F.col("vec_id") == 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    out = idx.topk(queries, k=5)
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    plan = out._jdf.queryExecution().executedPlan().toString()
    pruned = [
        l
        for l in plan.splitlines()
        if "PartitionFilters" in l
        and "dynamicpruningexpression(centroid_id" in l
    ]
    assert pruned, plan  # the cell subquery must reach the scan


def test_assignments_cover_corpus_once(spark, built):
    """Every corpus vector lands in exactly one cell partition."""
    idx, emb, _ = built
    n = emb.count()
    a = idx.assignments()
    assert a.count() == n
    assert a.select("vec_id").distinct().count() == n
    n_cells = a.select("centroid_id").distinct().count()
    assert 1 < n_cells <= 8


def test_incremental_add_matches_full_build(spark, tmp_path):
    """Intaking the corpus in two slices (build on the first, add the
    second) serves identically to building on the full corpus with the
    same fixed centroids — cells only ever gain rows, never move."""
    load_tables(spark, SF)
    emb = spark.table("embeddings")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"),
        as_double(F.col("embedding")).alias("cvec"),
    )
    first = emb.filter(F.col("vec_id") % 2 == 0)
    second = emb.filter(F.col("vec_id") % 2 == 1)

    inc = IVFIndex.build(
        spark, first, str(tmp_path / "inc"), centroids=centroids
    )
    inc.add(second)
    full = IVFIndex.build(
        spark, emb, str(tmp_path / "full"), centroids=centroids
    )

    queries = emb.filter(
        (F.col("vec_id") >= 8) & (F.col("vec_id") < 12)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    assert _rows(inc.topk(queries, k=5)) == _rows(full.topk(queries, k=5))
    assert inc.assignments().count() == full.assignments().count()
