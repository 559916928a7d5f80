"""Sources/sinks (SURVEY.md §2.1)."""

from open_tlm_spark.sources.points import events_as_points, melt_wide_table

__all__ = ["events_as_points", "melt_wide_table"]
