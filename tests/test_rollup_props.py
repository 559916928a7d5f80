"""Property tests for the rollup algebra (SURVEY.md §5 properties):
  1. merge law:    combine(agg(A), agg(B)) == agg(A ∪ B)
  2. cascade law:  rollup d from level d/10 == rollup d from raw
  3. permutation invariance: input order never changes results
  4. router thresholds match the reference exactly
"""

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from open_tlm_spark.operators.rollup import (
    aggregate_points,
    build_rollup_cascade,
    cascade_from_finer,
    combine_rollups,
    recommended_fidelity,
)
from open_tlm_spark.schemas import FIDELITIES, POINTS_SCHEMA


def _random_points(n=500, seed=7):
    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(n):
        ts = base + dt.timedelta(seconds=rng.uniform(0, 50_000))
        rows.append((f"ds{rng.randint(0, 3)}", ts, rng.uniform(-100, 100)))
    return rows


def _sorted_rollup(df):
    return [
        (r.dataset_id, r.bin_ts, r.min_value, r.max_value,
         pytest.approx(r.sum_values, rel=1e-9), r["count"])
        for r in df.orderBy("dataset_id", "bin_ts").collect()
    ]


def test_merge_law(spark):
    rows = _random_points()
    a = spark.createDataFrame(rows[:250], POINTS_SCHEMA)
    b = spark.createDataFrame(rows[250:], POINTS_SCHEMA)
    whole = spark.createDataFrame(rows, POINTS_SCHEMA)
    for d in (10, 1000):
        merged = combine_rollups(aggregate_points(a, d), aggregate_points(b, d))
        direct = aggregate_points(whole, d)
        assert _sorted_rollup(direct) == _sorted_rollup(merged)


def test_cascade_law(spark):
    df = spark.createDataFrame(_random_points(), POINTS_SCHEMA)
    cascade = build_rollup_cascade(df)
    for d in FIDELITIES:
        direct = aggregate_points(df, d)
        assert _sorted_rollup(direct) == _sorted_rollup(cascade[d])


def test_permutation_invariance(spark):
    rows = _random_points(n=200)
    shuffled = rows[:]
    random.Random(99).shuffle(shuffled)
    a = aggregate_points(spark.createDataFrame(rows, POINTS_SCHEMA), 100)
    b = aggregate_points(spark.createDataFrame(shuffled, POINTS_SCHEMA), 100)
    assert _sorted_rollup(a) == _sorted_rollup(b)


def test_router_thresholds():
    """Reference _recommended_fidelity (src/index.py:252-275)."""
    assert recommended_fidelity(0) is None
    assert recommended_fidelity(499) is None  # < MAX_DURATION_FULL (500 s)
    assert recommended_fidelity(500) == 1
    assert recommended_fidelity(4_999) == 1
    assert recommended_fidelity(5_000) == 10
    assert recommended_fidelity(49_999) == 10
    assert recommended_fidelity(50_000) == 100
    assert recommended_fidelity(499_999) == 100
    assert recommended_fidelity(500_000) == 1000
    assert recommended_fidelity(5_000_000) == 10_000
    assert recommended_fidelity(50_000_000) == 100_000
    assert recommended_fidelity(10**10) == 100_000


def test_fanout_guard(spark, tmp_path):
    """O4/T5: explicit-fidelity queries over absurd ranges are
    rejected; auto-routing never trips the guard."""
    import datetime as dt

    from open_tlm_spark.store import TelemetryStore

    store = TelemetryStore(spark, str(tmp_path))
    start = dt.datetime(1970, 1, 2, tzinfo=dt.timezone.utc)
    end = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    with pytest.raises(ValueError, match="points"):
        store.get("x", start, end, fidelity=None)
    with pytest.raises(ValueError, match="points"):
        store.get("x", start, end, fidelity=1)
    # auto-routing picks 100000s -> fine
    assert store.get("x", start, end).count() == 0
