"""Time functions — ISO-8601 boundary codecs and bin truncation.

Reference parity:
  * from_iso/to_iso  <- datetime.fromisoformat / .isoformat
    (reference src/index.py:119,568) — but UTC, not naive-local
    (documented reference bug, SURVEY.md §4).
  * floor_to         <- int(int(ts/d)*d) bin assignment
    (reference src/index.py:299).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ISO_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def from_iso(col: Column | str) -> Column:
    """ISO-8601 string -> TimestampType (F1)."""
    return F.to_timestamp(col)


def to_iso(col: Column | str) -> Column:
    """TimestampType -> ISO-8601 string (F2)."""
    return F.date_format(col, ISO_FMT)


def epoch_seconds(col: Column | str) -> Column:
    """Timestamp -> epoch seconds as double (sub-second preserved)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c) / F.lit(1_000_000.0)


def floor_to(col: Column | str, duration_s: int) -> Column:
    """Bin-start epoch seconds: floor(epoch(ts)/d)*d as BIGINT (F3).

    Matches the reference's int(int(ts/d)*d) for ts >= epoch and the
    DuckDB oracle expression (epoch_us(ts) // (d*1000000)) * d.
    Pure integer arithmetic (modulo on micros) — a float division
    here could disagree with the oracle on exact bin boundaries.
    """
    c = F.col(col) if isinstance(col, str) else col
    du = duration_s * 1_000_000
    micros = F.unix_micros(c)
    bin_micros = micros - (micros % F.lit(du))
    # bin_micros is divisible by 1e6, so this division is exact.
    return (bin_micros / F.lit(1_000_000)).cast("long")
