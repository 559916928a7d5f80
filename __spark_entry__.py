"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship query (TPC-H Q1 pricing summary) at sf0.001.
queries()    — SURVEY.md §2 operator inventory, one callable each.
oracle_sql() — matching DuckDB SQL for the driver's correctness gate.

Implementation lives in open_tlm_spark.plans (registry pattern); this
module stays a thin adapter so the driver contract never drifts from
the engine.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from open_tlm_spark.plans import REGISTRY

    return REGISTRY["tpch_q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from open_tlm_spark.plans import spark_queries

    return spark_queries()


def oracle_sql() -> dict[str, str]:
    from open_tlm_spark.plans import oracle_queries

    return oracle_queries()
