"""open_tlm_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference time-series store
(bwoodbury3/open-tlm), re-expressed Spark-first.

Design (see SURVEY.md):
  * The reference's data model — many named (ts, value) series + one
    annotation stream — maps to long/narrow DataFrames
    (``points(dataset_id, ts, value)``), Parquet-backed, with
    materialized multi-resolution rollup tables.
  * Every reference operator is declared via the DataFrame/SQL API so
    Catalyst does predicate pushdown, partition pruning, and
    whole-stage codegen; Python UDFs are reserved for genuinely
    non-relational kernels (multimodal decode stubs).
  * Beyond reference parity: dedup (exact / MinHash-LSH / SimHash /
    n-gram Jaccard), embedding similarity search, and text-analysis
    operators for large-scale training-data pipelines.
"""

from open_tlm_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
