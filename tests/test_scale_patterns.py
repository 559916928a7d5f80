"""Scale-pattern tests: salting correctness and bucketed co-located
joins (the two explicit levers beyond AQE for 100 TB shuffles)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from open_tlm_spark.functions.time import floor_to
from open_tlm_spark.operators.rollup import aggregate_points
from open_tlm_spark.operators.skew import salted_join, salted_rollup
from open_tlm_spark.schemas import POINTS_SCHEMA


def _skewed_points(spark, n=5000):
    """One hot series with 90% of the rows + a cold tail."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(n):
        ds = "hot" if i % 10 else f"cold{i % 7}"
        rows.append((ds, base + dt.timedelta(seconds=i / 10), float(i % 100)))
    return spark.createDataFrame(rows, POINTS_SCHEMA)


def test_salted_rollup_exact(spark):
    """Salting must not change results — only shuffle balance."""
    pts = _skewed_points(spark)
    plain = aggregate_points(pts, 100)
    salted = salted_rollup(pts, floor_to("ts", 100), n_salts=8)
    a = {
        (r.dataset_id, r.bin_ts): (r.min_value, r.max_value, r["count"])
        for r in plain.collect()
    }
    b = {
        (r.dataset_id, r.bin_ts): (r.min_value, r.max_value, r["count"])
        for r in salted.collect()
    }
    assert a == b
    sums_a = {(r.dataset_id, r.bin_ts): r.sum_values for r in plain.collect()}
    sums_b = {(r.dataset_id, r.bin_ts): r.sum_values for r in salted.collect()}
    for k in sums_a:
        assert sums_a[k] == pytest.approx(sums_b[k], rel=1e-9)


def test_salted_join_matches_plain_join(spark):
    left = _skewed_points(spark).withColumnRenamed("dataset_id", "k")
    right = spark.createDataFrame(
        [("hot", 1.5)] + [(f"cold{i}", float(i)) for i in range(7)],
        "k string, factor double",
    )
    plain = left.join(right, "k").select("k", "ts", "value", "factor")
    salted = salted_join(left, right, "k", n_salts=4).select(
        "k", "ts", "value", "factor"
    )
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Bucketing both fact tables on the join key pre-co-locates them:
    the join plan must contain NO Exchange (shuffle) — at 100 TB this
    is the difference between a network-bound and a local join."""
    n = 10_000
    orders = spark.range(n).select(
        F.col("id").alias("o_key"), (F.col("id") % 100).alias("o_val")
    )
    items = spark.range(n * 3).select(
        (F.col("id") % n).alias("i_key"), (F.col("id") % 7).alias("i_val")
    )
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS items_b")
    (
        orders.write.bucketBy(8, "o_key").sortBy("o_key")
        .mode("overwrite").saveAsTable("orders_b")
    )
    (
        items.write.bucketBy(8, "i_key").sortBy("i_key")
        .mode("overwrite").saveAsTable("items_b")
    )
    # disable broadcast so the co-location is what avoids the shuffle
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("orders_b").join(
            spark.table("items_b"),
            F.col("o_key") == F.col("i_key"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() == n * 3
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS items_b")
