"""Point-source adapters.

* events_as_points — view the driver's ``events`` table as the
  reference's points model: dataset_id = event_type, ts, value.
* melt_wide_table — the reference's Parquet upload client
  (examples/upload_data.py:58-115): designate a time column, melt
  every other numeric column into a series named ``prefix+column``,
  drop NaNs. Spark-native unpivot (no pandas round-trip).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def events_as_points(events: DataFrame) -> DataFrame:
    """Map the events stream to points(dataset_id, ts, value)."""
    return events.select(
        F.col("event_type").alias("dataset_id"),
        F.col("ts"),
        F.col("value"),
    )


def melt_wide_table(
    df: DataFrame, time_column: str, prefix: str = ""
) -> DataFrame:
    """S9: wide table -> long points. One series per numeric column.

    unpivot is a narrow transformation (no shuffle); NaN/null filter
    mirrors the reference client (examples/upload_data.py:78).
    """
    value_cols = [
        f.name
        for f in df.schema.fields
        if f.name != time_column and isinstance(f.dataType, NumericType)
    ]
    melted = df.unpivot(
        [time_column],
        [F.col(c).cast("double").alias(c) for c in value_cols],
        "series",
        "value",
    )
    return (
        melted.select(
            F.concat(F.lit(prefix), F.col("series")).alias("dataset_id"),
            F.col(time_column).cast("timestamp").alias("ts"),
            "value",
        )
        .filter(F.col("value").isNotNull() & ~F.isnan("value"))
    )
