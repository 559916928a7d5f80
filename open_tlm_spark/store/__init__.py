"""Storage layer: Parquet-backed telemetry store + annotation store."""

from open_tlm_spark.store.tsdb import TelemetryStore
from open_tlm_spark.store.comments import CommentStore

__all__ = ["TelemetryStore", "CommentStore"]
