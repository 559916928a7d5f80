"""Interval (range) join: match rows to the time windows containing them.

The reference has no joins at all (SURVEY.md §2.3); this is a
capability extension in the same family as the as-of join
(operators/asof.py) — "which events fall inside which windows" is the
canonical telemetry question (annotate points with comment/mark spans,
correlate error windows with traffic).

Scale design. A naive `e.ts BETWEEN w.start AND w.end` join is a
theta join: Spark can only plan it as BroadcastNestedLoopJoin (fine
when one side is tiny, quadratic disaster otherwise). The scalable
form used here is the standard bucketed rewrite (what Databricks'
range-join hint and KDB's window join do under the hood):

  1. pick a bucket width B (~ the typical window length);
  2. each window explodes into the ceil(len/B)+1 buckets it overlaps
     (`sequence(floor(start/B), floor(end/B))`) — bounded expansion;
  3. each probe row maps to exactly ONE bucket (`floor(ts/B)`);
  4. shuffle-hash equi-join on the bucket key, then exact post-filter
     on the real bounds.

This turns O(|E|x|W|) comparisons into an equi-join whose cost is
driven by co-bucketed pairs only, partitions cleanly by bucket, and
needs no broadcast — both sides can be 100 TB. Skewed buckets (a
hot minute) can further be salted with operators/skew.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    probe: DataFrame,
    windows: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 600,
    closed: str = "left",
) -> DataFrame:
    """Join probe rows onto every window whose [start, end) (or
    [start, end] with closed="both") interval contains probe.ts_col.

    probe:   any frame with a timestamp column `ts_col`.
    windows: any frame with timestamp columns `start_col`, `end_col`.
    Returns probe columns + windows columns (bucket key dropped).

    Bucket width trades expansion factor (windows emit
    len/bucket_seconds copies) against bucket selectivity (probe rows
    meet unrelated windows co-bucketed with theirs). Set it near the
    median window length.
    """
    if closed not in ("left", "both"):
        raise ValueError(f"closed must be 'left' or 'both', got {closed!r}")
    b = F.lit(int(bucket_seconds))
    w = windows.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / b),
                F.floor(F.unix_timestamp(F.col(end_col)) / b),
            )
        ),
    )
    p = probe.withColumn(
        "_bucket", F.floor(F.unix_timestamp(F.col(ts_col)) / b)
    )
    upper = (
        F.col(ts_col) < F.col(end_col)
        if closed == "left"
        else F.col(ts_col) <= F.col(end_col)
    )
    return (
        p.join(w, "_bucket")
        .filter((F.col(ts_col) >= F.col(start_col)) & upper)
        .drop("_bucket")
    )
