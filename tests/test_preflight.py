"""Pre-flight hot-key probe (operators/preflight.py): Misra-Gries
bounds hold through the distributed fold, recommendations react to
planted skew, and the auto-salted rollup stays exact."""

import pytest
from pyspark.sql import functions as F

from open_tlm_spark.operators.preflight import (
    HotKeyReport,
    probe_hot_keys,
    salted_rollup_auto,
)


def _planted(spark, n=40000, hot_share=0.6, n_cold=500):
    """hot_share of rows on one key, the rest spread over n_cold."""
    hot_n = int(n * hot_share)
    return spark.range(n).select(
        F.when(F.col("id") < hot_n, F.lit("hot"))
        .otherwise(F.concat(F.lit("cold_"), (F.col("id") % n_cold)))
        .alias("dataset_id"),
        F.timestamp_micros((F.col("id") * 1_000_000).cast("long")).alias(
            "ts"
        ),
        (F.col("id") % 97).cast("double").alias("value"),
    )


def test_probe_bounds_hold_on_planted_skew(spark):
    df = _planted(spark)
    rep = probe_hot_keys(df, "dataset_id", k=64)
    assert rep.n_rows == 40000
    true_hot = 24000
    est = rep.counters.get("hot", 0)
    # MG guarantee: lower bound, undercounting by at most n/(k+1)
    assert est <= true_hot <= est + rep.error_bound
    lo, hi = rep.share_bounds("hot")
    assert lo <= 0.6 <= hi
    # a 60% key is provably hot at the 5% line; cold keys are not
    hot = rep.hot_keys(min_share=0.05)
    assert set(hot) == {"hot"}


def test_probe_uniform_recommends_no_salting(spark):
    df = spark.range(30000).select(
        F.concat(F.lit("k"), (F.col("id") % 3000)).alias("dataset_id")
    )
    rep = probe_hot_keys(df, "dataset_id", k=64)
    assert rep.hot_keys(min_share=0.05) == {}
    assert rep.recommended_salts(parallelism=32) == 1


def test_recommended_salts_scale_with_share():
    rep = HotKeyReport(n_rows=100000, k=256, counters={"hot": 60000})
    # 60% of rows x 32-way parallelism -> ~20 average tasks of work
    assert rep.recommended_salts(parallelism=32) == 20
    assert rep.recommended_salts(parallelism=32, max_salts=8) == 8
    assert (
        HotKeyReport(100000, 256, {"warm": 3000}).recommended_salts(32)
        == 1
    )


def test_recommended_max_df_floors():
    rep = HotKeyReport(n_rows=1000, k=256, counters={})
    # tiny corpus: static floor wins
    assert rep.recommended_max_df(n_docs=500) == 100
    # large corpus: stop_share wins
    big = HotKeyReport(n_rows=10**6, k=256, counters={})
    assert big.recommended_max_df(n_docs=10**6) == 100_000
    # sketch resolution floor: never cap below what the probe resolves
    coarse = HotKeyReport(n_rows=10**8, k=9, counters={})
    assert coarse.recommended_max_df(n_docs=1000) == 10**7


def test_salted_rollup_auto_exact_and_salted(spark):
    df = _planted(spark, n=20000, hot_share=0.7)
    bin_col = F.unix_seconds(F.col("ts")) - F.unix_seconds(F.col("ts")) % 1000
    plain = (
        df.groupBy("dataset_id", bin_col.alias("bin_ts"))
        .agg(
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.sum("value").alias("sum_values"),
            F.count("value").alias("count"),
        )
    )
    auto, n_salts = salted_rollup_auto(df, bin_col, parallelism=32)
    assert n_salts > 1  # the probe saw the planted 70% key
    want = {tuple(r) for r in plain.collect()}
    got = {tuple(r) for r in auto.collect()}
    assert got == want  # salting changes shuffle balance, not results


def test_salted_rollup_auto_skips_salting_when_uniform(spark):
    df = _planted(spark, n=5000, hot_share=0.0, n_cold=1000)
    bin_col = F.unix_seconds(F.col("ts")) - F.unix_seconds(F.col("ts")) % 1000
    auto, n_salts = salted_rollup_auto(df, bin_col, parallelism=32)
    assert n_salts == 1
    assert auto.count() > 0
