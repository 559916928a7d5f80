"""Skew handling: salted aggregation / salted join.

AQE's skew-join splitting (enabled in session.py) covers sort-merge
joins at runtime; salting is the explicit tool for the remaining
cases — skewed GROUP BY keys (one series/dataset dominating) and
broadcast-infeasible skewed joins.

Pattern (standard): add salt = pmod(hash-ish, n_salts) to the hot
key, aggregate (key, salt) partially — n_salts-way parallelism for
the hot key — then re-aggregate by key alone. Works for any algebraic
aggregate (the same property the rollup cascade relies on).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_rollup(
    points: DataFrame,
    bin_col: Column,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage tumbling aggregate for skewed series: stage 1 groups
    on (dataset_id, bin, salt) — the hot key fans out over n_salts
    reducers — stage 2 merges the partials (algebraic, exact).

    Output schema == ROLLUP_SCHEMA; results are identical to the
    unsalted aggregate (asserted in tests), only the shuffle balance
    changes. The salt derives from a hash of the row's timestamp —
    deterministic, uniform, no RNG.
    """
    salt = F.pmod(F.unix_micros("ts"), F.lit(n_salts))
    partial = points.groupBy(
        "dataset_id", bin_col.alias("bin_ts"), salt.alias("_salt")
    ).agg(
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.sum("value").alias("sum_values"),
        F.count("value").alias("count"),
    )
    return partial.groupBy("dataset_id", "bin_ts").agg(
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
        F.sum("sum_values").alias("sum_values"),
        F.sum("count").alias("count"),
    )


def salted_join(
    left: DataFrame,
    right_small: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skewed equi-join without broadcast: salt the (large, skewed)
    left side, replicate the right side once per salt, join on
    (key, salt). Right-side blow-up is n_salts x |right| — use when
    right is modest but above the broadcast threshold and left has
    hot keys AQE cannot split (e.g. post-aggregation skew).
    """
    salted_left = left.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salts - 1))
    ).alias("_salt")
    replicated_right = right_small.select("*", salts)
    out = salted_left.join(replicated_right, [key, "_salt"])
    return out.drop("_salt")
