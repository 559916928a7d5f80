"""Structured Streaming ingest (SURVEY.md §2.9, build-plan phase 3)."""

from open_tlm_spark.streaming.ingest import (
    start_file_ingest,
    start_metrics_stream,
    streaming_rollup,
    streaming_sessions,
)
from open_tlm_spark.streaming.joins import (
    streaming_attribution_rates,
    streaming_touch_attribution,
)

__all__ = [
    "start_file_ingest",
    "start_metrics_stream",
    "streaming_rollup",
    "streaming_sessions",
    "streaming_attribution_rates",
    "streaming_touch_attribution",
]
