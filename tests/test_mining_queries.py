"""Property tests for the round-6b mining/attribution/governance
queries — the behavioral claims the DuckDB oracle equality can't
express (value conservation, combinatorial counts, bounds)."""

from __future__ import annotations

import math

from open_tlm_spark.plans import REGISTRY
from open_tlm_spark.plans.mining_queries import (
    _AR_MIN_CO,
    _N_SHARDS,
    _SAX_TOP,
    _SE_PERIODS,
    _TS_NB,
)

SF = "/root/testdata/sf0.001"


def rows(spark, name):
    return REGISTRY[name].fn(spark, SF).collect()


def test_attribution_conserves_purchase_value(spark):
    """Linear attribution must redistribute, never create, value:
    the channel sums must add up to the total purchase value within
    the per-credit 6-dp floor rounding (error < 1e-6 per credit),
    and every purchase must be credited exactly once worth."""
    out = rows(spark, "events_attribution_linear")
    attributed = sum(r.attributed_value for r in out)
    n_credits = sum(r.n_credits for r in out)
    from open_tlm_spark.session import load_tables
    from pyspark.sql import functions as F

    load_tables(spark, SF)
    purchases = (
        spark.table("events")
        .filter(F.col("event_type") == "purchase")
        .agg(F.sum("value").alias("v"), F.count("*").alias("n"))
        .first()
    )
    assert abs(attributed - purchases.v) <= n_credits * 1e-6 + 1e-6
    # every purchase lands in >=1 channel, direct included
    assert sum(r.n_purchases for r in out) >= purchases.n
    assert {r.channel for r in out} <= {"view", "click", "direct"}


def test_association_rules_bounds(spark):
    """support <= confidence <= 1, lift > 0, co-occurrence floor
    respected, and the canonical part_a < part_b ordering holds."""
    out = rows(spark, "orders_association_rules")
    for r in out:
        assert r.part_a < r.part_b
        assert r.n_co >= _AR_MIN_CO
        assert 0 < r.support <= r.conf_a_to_b <= 1 + 1e-9
        assert r.lift > 0
    # ranking is by lift desc with (part_a, part_b) tiebreak
    keys = [(-r.lift, r.part_a, r.part_b) for r in out]
    assert keys == sorted(keys)


def test_sax_symbols_are_valid_words(spark):
    """Motifs are 3-letter words over the quartile alphabet, at most
    _SAX_TOP per series, ranked by count with the word tiebreak."""
    out = rows(spark, "ts_sax_symbols")
    assert len(out) > 0
    by_series: dict = {}
    for r in out:
        assert len(r.motif) == 3 and set(r.motif) <= set("abcd")
        assert 1 <= r.rk <= _SAX_TOP
        by_series.setdefault(r.dataset_id, []).append(
            (r.rk, -r.n_occ, r.motif)
        )
    for pts in by_series.values():
        pts.sort()
        assert [p[0] for p in pts] == list(range(1, len(pts) + 1))
        assert [(p[1], p[2]) for p in pts] == sorted(
            (p[1], p[2]) for p in pts
        )


def test_spectral_entropy_bounds(spark):
    """Normalized entropy lives in [0, 1] (up to 6-dp rounding) and
    the dominant period comes from the fixed grid."""
    out = rows(spark, "ts_spectral_entropy")
    assert len(out) > 0
    for r in out:
        assert -1e-6 <= r.spectral_entropy <= 1 + 1e-6
        assert r.dominant_period_s in _SE_PERIODS


def test_shards_partition_the_corpus(spark):
    """Shards are a PARTITION of the corpus: doc counts sum to the
    corpus size, ids cover 0..N-1 only, chi-squared is nonnegative."""
    out = rows(spark, "shards_assignment_balance")
    assert {r.shard for r in out} <= set(range(_N_SHARDS))
    from open_tlm_spark.session import load_tables

    load_tables(spark, SF)
    n_docs = spark.table("documents").count()
    assert sum(r.n_docs for r in out) == n_docs
    for r in out:
        assert r.chi2_source >= 0
        assert r.n_tokens >= r.n_docs  # every gated doc has >=1 token


def test_theil_sen_pair_combinatorics(spark):
    """The pairwise stage must be exactly C(n_buckets, 2) — the
    fixed-grid scale contract — and the bucket count can never
    exceed the grid size."""
    out = rows(spark, "ts_theil_sen_slope")
    assert len(out) > 0
    for r in out:
        assert 2 <= r.n_buckets <= _TS_NB
        assert r.n_pairs == r.n_buckets * (r.n_buckets - 1) // 2
        assert math.isfinite(r.theil_sen_slope)


def test_kanonymity_covers_every_row(spark):
    """The k-bucket histogram partitions the customer table: row
    counts sum to |customer| and fractions to ~1."""
    out = rows(spark, "customers_kanonymity_audit")
    from open_tlm_spark.session import load_tables

    load_tables(spark, SF)
    n = spark.table("customer").count()
    assert sum(r.n_rows for r in out) == n
    assert abs(sum(r.frac_rows for r in out) - 1.0) <= len(out) * 1e-6
    assert {r.k_bucket for r in out} <= {"1=unique", "2-4", "5-19", "20+"}


def test_theil_sen_resists_outliers(spark):
    """The point of Theil-Sen: two fully-corrupted buckets (of 48)
    leave the median pairwise slope EXACTLY on the true trend, while
    OLS is pulled far off. Synthetic series: value == bucket index
    (true slope 1.0/bucket), +1000 on every point of two buckets."""
    from pyspark.sql import functions as F

    from open_tlm_spark.plans.mining_queries import ts_theil_sen_slope

    n = 4800
    df = (
        spark.range(n)
        .select(
            F.timestamp_micros(F.col("id") * 1000).alias("ts"),
            F.lit("synthetic").alias("event_type"),
            (
                F.floor(F.col("id") / 100).cast("double")
                + F.when(
                    F.floor(F.col("id") / 100).isin(10, 30), 1000.0
                ).otherwise(0.0)
            ).alias("value"),
        )
    )
    df.createOrReplaceTempView("events")
    try:
        r = ts_theil_sen_slope(spark, "").collect()[0]
        assert r.n_buckets == 48
        assert abs(r.theil_sen_slope - 1.0) < 1e-9
        # OLS is dragged ~0.76 off the true slope by the two outlier
        # buckets (1 + 1000*((10-23.5)+(30-23.5))/Sxx, Sxx=9212)
        assert abs(r.ols_slope - 1.0) > 0.5
    finally:
        # this view SHADOWED the shared testdata view and
        # load_tables memoizes per (session, sf_dir) — drop the
        # override AND clear the memo so later tests re-register
        spark.catalog.dropTempView("events")
        from open_tlm_spark import session as S

        S._LOADED.clear()
