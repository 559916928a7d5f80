"""Scalar function helpers (SURVEY.md §2.8).

All are thin wrappers over built-in ``pyspark.sql.functions`` so every
expression stays JVM-side inside whole-stage codegen — no Python UDFs
in the hot path.
"""

from open_tlm_spark.functions.time import (
    epoch_seconds,
    floor_to,
    from_iso,
    to_iso,
)

__all__ = ["epoch_seconds", "floor_to", "from_iso", "to_iso"]
