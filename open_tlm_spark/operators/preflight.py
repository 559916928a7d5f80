"""Pre-flight hot-key probe: wire the Misra-Gries sketch into the
jobs it was built for.

VERDICT r7 #5a: `streaming/heavy_hitters.py` provides the O(k)-state
sketch; this module closes the loop — one cheap sketch pass over the
key column decides, BEFORE the expensive shuffle job runs, whether the
job needs skew handling and with what parameters, instead of a human
hand-tuning `n_salts` / `max_df` per dataset. This is exactly how a
100 TB pipeline spends its budget: a probe that reads the key column
once (narrow, Arrow-batched, no shuffle) is ~free next to the join or
aggregate it protects.

Guarantees used (Misra & Gries 1982; Agarwal et al., PODS 2012): with
k counters over n rows, every estimate is a LOWER bound on the true
count, undercounting by at most n/(k+1); every key with true count
> n/(k+1) is guaranteed present in the summary. So:

  * a key REPORTED with share s has true share in [s, s + 1/(k+1)];
  * a key ABSENT from the summary has true share <= 1/(k+1).

With the default k=256 the probe resolves shares down to ~0.4% — far
below where salting starts to matter.

The probe runs actions (it folds a sketch and reads a count), so
anything built on it is pipeline/driver-side tooling, not a lazy
registered builder — same contract as the CC loop in
`operators/dedup.py`.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from open_tlm_spark.streaming.heavy_hitters import _mg_update, mg_merge

# key=NULL rows carry the partition's total row count, so one Arrow
# pass yields both the sketch and n (no second scan for the count).
_PROBE_SCHEMA = "key string, weight long"


@dataclass(frozen=True)
class HotKeyReport:
    """Result of one probe pass.

    `counters` are merged Misra-Gries estimates — lower bounds on the
    true per-key counts, each undercounting by at most `error_bound`.
    """

    n_rows: int
    k: int
    counters: dict[str, int]

    @property
    def error_bound(self) -> int:
        return self.n_rows // (self.k + 1)

    def share_bounds(self, key: str) -> tuple[float, float]:
        """[lower, upper] bound on the key's true share of rows."""
        if self.n_rows == 0:
            return (0.0, 0.0)
        est = self.counters.get(key, 0)
        return (
            est / self.n_rows,
            (est + self.error_bound) / self.n_rows,
        )

    def hot_keys(self, min_share: float = 0.05) -> dict[str, float]:
        """Keys whose true share PROVABLY reaches `min_share` (the
        lower bound clears it — no false positives); ordered hottest
        first. Keys that merely MIGHT reach it (upper bound clears it)
        are excluded: salting a non-hot key costs an extra shuffle
        stage for nothing."""
        if self.n_rows == 0:
            return {}
        out = {
            key: est / self.n_rows
            for key, est in self.counters.items()
            if est / self.n_rows >= min_share
        }
        return dict(
            sorted(out.items(), key=lambda kv: kv[1], reverse=True)
        )

    def recommended_salts(
        self,
        parallelism: int,
        min_share: float = 0.05,
        max_salts: int = 256,
    ) -> int:
        """Salt count for a groupBy/join keyed on the probed column:
        enough fan-out that the hottest key's rows spread to roughly
        `parallelism` tasks worth of even work, 1 (= do not salt) when
        no key provably dominates. ceil(share * parallelism) is the
        number of average-sized tasks the hot key currently occupies —
        exactly the fan-out that levels it."""
        hot = self.hot_keys(min_share)
        if not hot:
            return 1
        top = next(iter(hot.values()))
        return max(1, min(max_salts, math.ceil(top * parallelism)))

    def recommended_max_df(
        self, n_docs: int, stop_share: float = 0.10, floor: int = 100
    ) -> int:
        """Document-frequency cap for shingle/fingerprint joins
        (operators/dedup.py `max_df`): cap at `stop_share` of the
        corpus, but never below the cap the probe can actually
        resolve (error_bound) or the static default (`floor`) — a
        tighter cap than the sketch's resolution would drop shingles
        on noise."""
        return max(floor, self.error_bound, int(stop_share * n_docs))


def probe_hot_keys(df: DataFrame, key: str | Column, k: int = 256) -> HotKeyReport:
    """One narrow Arrow pass over `key`: per-partition Misra-Gries
    fold (O(k) state, no shuffle — the sketch frame is <= partitions x
    (k+1) rows) merged driver-side. Accepts a column NAME or an
    EXPRESSION (e.g. the shingle column after explode)."""
    col = F.col(key) if isinstance(key, str) else key
    keyed = df.select(col.cast("string").alias("k"))

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        total = 0
        for pdf in batches:
            total += len(pdf)
            for kv, cnt in pdf["k"].value_counts(dropna=True).items():
                _mg_update(counters, str(kv), int(cnt), k)
        yield pd.DataFrame(
            {
                "key": list(counters) + [None],
                "weight": list(counters.values()) + [total],
            }
        ).astype({"key": "string", "weight": "int64"})

    summed: dict[str, int] = {}
    n_rows = 0
    for r in keyed.mapInPandas(fold, _PROBE_SCHEMA).collect():
        if r.key is None:
            n_rows += r.weight
        else:
            summed[r.key] = summed.get(r.key, 0) + r.weight
    return HotKeyReport(
        n_rows=n_rows, k=k, counters=mg_merge({}, summed, k)
    )


def salted_rollup_auto(
    points: DataFrame,
    bin_col: Column,
    parallelism: int,
    min_share: float = 0.05,
) -> tuple[DataFrame, int]:
    """Probe `dataset_id`, pick the salt fan-out, and build the
    tumbling rollup: the unsalted single-stage aggregate when no
    series provably dominates, `salted_rollup` with the recommended
    fan-out when one does. Returns (frame, n_salts) so callers can
    log the decision. Results are EXACT either way — only the shuffle
    balance changes."""
    from open_tlm_spark.operators.skew import salted_rollup

    report = probe_hot_keys(points, "dataset_id")
    n_salts = report.recommended_salts(parallelism, min_share)
    if n_salts <= 1:
        plain = points.groupBy(
            "dataset_id", bin_col.alias("bin_ts")
        ).agg(
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.sum("value").alias("sum_values"),
            F.count("value").alias("count"),
        )
        return plain, 1
    return salted_rollup(points, bin_col, n_salts=n_salts), n_salts
