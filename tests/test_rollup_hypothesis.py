"""Property-based checks of the rollup algebra (SURVEY.md §5):
hypothesis generates adversarial point sets (duplicated timestamps,
negative/zero/huge values, arbitrary split points) and the laws must
hold exactly for min/max/count and to float tolerance for sums.

Kept to a few examples per property — each check runs Spark jobs, so
the value is in the generator's edge cases, not in volume.
"""

import datetime as dt
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from open_tlm_spark.operators.rollup import (
    aggregate_points,
    cascade_from_finer,
    combine_rollups,
)
from open_tlm_spark.schemas import POINTS_SCHEMA

_EPOCH = dt.datetime(2024, 1, 1)

points_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(min_value=0, max_value=50_000).map(
            lambda s: _EPOCH + dt.timedelta(seconds=s / 10)
        ),
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
    ),
    min_size=1,
    max_size=60,
)


def _agg_dict(df):
    return {
        (r.dataset_id, r.bin_ts): (r.min_value, r.max_value, r.sum_values, r["count"])
        for r in df.collect()
    }


def _check_equal(a, b):
    assert a.keys() == b.keys()
    for k in a:
        mn1, mx1, s1, c1 = a[k]
        mn2, mx2, s2, c2 = b[k]
        assert mn1 == mn2 and mx1 == mx2 and c1 == c2
        assert math.isclose(s1, s2, rel_tol=1e-9, abs_tol=1e-9)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=points_strategy, split=st.integers(min_value=0, max_value=60))
def test_merge_law_holds(spark, rows, split):
    """combine(agg(A), agg(B)) == agg(A ∪ B) for any split point."""
    split = min(split, len(rows))
    a, b = rows[:split], rows[split:]
    whole = spark.createDataFrame(rows, POINTS_SCHEMA)
    direct = _agg_dict(aggregate_points(whole, 100))
    if not a or not b:
        part = aggregate_points(spark.createDataFrame(rows, POINTS_SCHEMA), 100)
        _check_equal(direct, _agg_dict(part))
        return
    merged = combine_rollups(
        aggregate_points(spark.createDataFrame(a, POINTS_SCHEMA), 100),
        aggregate_points(spark.createDataFrame(b, POINTS_SCHEMA), 100),
    )
    _check_equal(direct, _agg_dict(merged))


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=points_strategy)
def test_cascade_law_holds(spark, rows):
    """rollup(d) from rollup(d/10) == rollup(d) from raw."""
    df = spark.createDataFrame(rows, POINTS_SCHEMA)
    fine = aggregate_points(df, 100)
    _check_equal(
        _agg_dict(aggregate_points(df, 1000)),
        _agg_dict(cascade_from_finer(fine, 1000)),
    )
