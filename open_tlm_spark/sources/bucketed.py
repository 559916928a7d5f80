"""Hive-style bucketed table writer — the co-located-join storage
layout for repeatedly-joined fact tables.

At 100 TB the dominant cost of a fact-fact join is the shuffle of
both sides on the join key. Writing each table `bucketBy(n, key)`
pre-hashes rows into n files per partition at INGEST time; Spark's
scan then reports HashPartitioning(key, n) and a sort-merge join of
two tables bucketed identically needs NO exchange at query time —
the shuffle is paid once at write, amortized over every subsequent
join. This is the storage-side answer the query-side `broadcast()`
can't give when both sides are large.

Works with Spark's built-in session catalog (no Hive metastore):
`saveAsTable` with an explicit path creates an external parquet
table whose bucket spec lives in the catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int,
    path: str,
    sort_keys: list[str] | None = None,
) -> None:
    """Write `df` as a bucketed external parquet table. Buckets are
    hashed on `keys`; `sort_keys` (default: keys) sorts within each
    bucket file so merge joins skip the per-partition sort when the
    reader preserves it."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        df.write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, keys[0], *keys[1:])
        .sortBy(*(sort_keys or keys))
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession, left: str, right: str, on, how: str = "inner"
) -> DataFrame:
    """Sort-merge join of two identically-bucketed tables. The merge
    hint pins SMJ (broadcast would mask the bucketing); with both
    sides bucketed on the join key into the same bucket count the
    planner emits ZERO exchanges for the join — asserted by
    tests/test_plan_quality.py::test_bucketed_join_no_shuffle."""
    return spark.table(left).hint("merge").join(spark.table(right), on, how)
