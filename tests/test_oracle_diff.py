"""Differential gate: every registered query must match its DuckDB
oracle at sf0.001 (the driver runs the same comparison at sf0.01 —
tools/diffcheck.py replicates it; run that for the full-size check)."""

import duckdb
import pytest

from open_tlm_spark.plans import REGISTRY
from tools.diffcheck import TABLES, compare

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, oracle_con, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, SF_DIR).toPandas()
    if q.oracle is None:
        assert len(sdf) >= 0  # rows-only check (non-SQL-expressible op)
        return
    ddf = oracle_con.execute(q.oracle).df()
    problems = compare(name, sdf, ddf)
    assert not problems, f"{name}: {problems}"


def test_check_first_names_all_registered():
    """_ordered() silently drops _CHECK_FIRST entries that don't
    exist in REGISTRY — a typo there would quietly burn one of the
    driver's ~50 correctness-window slots. Pin exact membership, and
    that the head has no duplicates (duplicates shift every later
    query's window position)."""
    from open_tlm_spark.plans import REGISTRY
    from open_tlm_spark.plans.registry import _CHECK_FIRST

    missing = [n for n in _CHECK_FIRST if n not in REGISTRY]
    assert not missing, f"_CHECK_FIRST names not in REGISTRY: {missing}"
    dupes = [n for n in set(_CHECK_FIRST) if _CHECK_FIRST.count(n) > 1]
    assert not dupes, f"_CHECK_FIRST duplicates: {dupes}"


def test_all_oracles_bind_with_safe_dtypes():
    """Bind-only dtype sweep over EVERY registered oracle: DuckDB
    resolves each oracle's output schema (no execution — runs in
    <1 s) and the diffcheck dtype gate must find nothing. This is the
    standing guard against the HUGEINT/DECIMAL passthrough class that
    shipped twice (sessionize r1, multimodal/docs_clean r2) before
    the gate existed — it catches a bad new oracle in plain pytest
    without waiting for the full differential run."""
    import os
    import sys

    import duckdb

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"),
    )
    import diffcheck

    from open_tlm_spark.plans import REGISTRY

    con = duckdb.connect()
    for t in diffcheck.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'/root/testdata/sf0.001/{t}.parquet'"
        )
    bad = {}
    for name, q in REGISTRY.items():
        if q.oracle is None:
            continue
        probs = diffcheck.oracle_type_problems(con.sql(q.oracle))
        if probs:
            bad[name] = probs
    assert not bad, f"oracles with unsafe output dtypes: {bad}"
