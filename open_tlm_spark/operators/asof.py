"""As-of join — align two time series ("what was sensor B's last
value when sensor A ticked?").

The reference only overlays series visually (J2, SURVEY.md §2.3);
a relational as-of join is the natural engine-level capability.

Spark has no native ASOF JOIN; the idiomatic distributed formulation
is union-tag + windowed last-value carry-forward:

    union(left tagged, right tagged)
      -> window partitionBy(key) orderBy(ts, side)
      -> last(right_value, ignoreNulls=True) over rowsBetween(-inf, 0)
      -> keep left rows

One shuffle on the key (same as any join), one in-partition sort —
NO range-join explosion: a naive `l JOIN r ON l.ts >= r.ts` + argmax
is O(n*m) per key; this is O((n+m) log(n+m)) per key and streams at
100 TB. Right-at-identical-ts sorts before left (inclusive
semantics, matching DuckDB's ASOF `l.ts >= r.ts`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "dataset_id",
    ts: str = "ts",
    value: str = "value",
    right_alias: str = "right_value",
) -> DataFrame:
    """For each left row, the most recent right `value` with
    right.ts <= left.ts (inclusive), per key. Unmatched -> NULL
    (left-asof semantics)."""
    l_tag = left.select(
        key, ts, F.lit(1).alias("_side"), F.col(value).alias("_lval"),
        F.lit(None).cast("double").alias("_rval"),
    )
    r_tag = right.select(
        key, ts, F.lit(0).alias("_side"),
        F.lit(None).cast("double").alias("_lval"),
        F.col(value).alias("_rval"),
    )
    # right sorts before left at equal ts -> inclusive join
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        l_tag.unionByName(r_tag)
        .withColumn(right_alias, F.last("_rval", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .select(key, ts, F.col("_lval").alias(value), right_alias)
    )
