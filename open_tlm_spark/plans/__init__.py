"""Query plans: the declared operator inventory (SURVEY.md §2) as
(PySpark query, DuckDB oracle SQL) pairs, plus the fidelity router."""

from open_tlm_spark.plans.registry import REGISTRY, register, spark_queries, oracle_queries

# Importing the query modules populates REGISTRY.
from open_tlm_spark.plans import tsdb_queries  # noqa: F401
from open_tlm_spark.plans import sql_queries  # noqa: F401
from open_tlm_spark.plans import pipeline_queries  # noqa: F401
from open_tlm_spark.plans import extended_queries  # noqa: F401
from open_tlm_spark.plans import advanced_queries  # noqa: F401
from open_tlm_spark.plans import curation_queries  # noqa: F401
from open_tlm_spark.plans import analytics_queries  # noqa: F401
from open_tlm_spark.plans import training_queries  # noqa: F401
from open_tlm_spark.plans import vector_queries  # noqa: F401
from open_tlm_spark.plans import retrieval_queries  # noqa: F401
from open_tlm_spark.plans import eval_queries  # noqa: F401
from open_tlm_spark.plans import selection_queries  # noqa: F401
from open_tlm_spark.plans import audit_queries  # noqa: F401
from open_tlm_spark.plans import mining_queries  # noqa: F401
from open_tlm_spark.plans import hygiene_queries  # noqa: F401

__all__ = ["REGISTRY", "register", "spark_queries", "oracle_queries"]
