"""Event-stream scale smoke for the round-6b mining family:
synthesize N events JVM-side (codegen'd column math, written
through parquet like a real stream landing zone), then time
  * events_attribution_linear — the bounded interval join,
  * ts_theil_sen_slope        — the fixed-grid pairwise stage,
  * ts_sax_symbols            — PAA + windowed motif counting
at decade-stepped event counts. This probes the SAME registered
builders (plans/mining_queries.py — no test doubles) at 10x-100x
the sf0.1 gate volume, where a quadratic join or a global-sort
window would surface.

Synthesis (deterministic, seedless): event i lands at
start + i * (30 d / n) (constant density ramp), belongs to user
pmod(xxhash64(i), n/1000) (~1000 events/user at any n — the
per-user density the attribution join's 24 h window bounds), types
via pmod(xxhash64(i, 1), 5), value = pmod(xxhash64(i, 2), 2000)/100.

Usage: python tools/events_scale_smoke.py [n_events ...]
(default 1_000_000 10_000_000)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

_TYPES = "array('view','click','purchase','error','signup')"
_START_US = 1_704_067_200_000_000  # 2024-01-01 UTC
_SPAN_US = 30 * 86_400 * 1_000_000


def synth_events(spark, n: int):
    users = max(n // 1000, 1)
    return spark.range(
        n, numPartitions=spark.sparkContext.defaultParallelism
    ).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.lit(_START_US)
            + (F.col("id") * F.lit(_SPAN_US / 1.0) / F.lit(float(n)))
            .cast("long")
        ).alias("ts"),
        F.pmod(F.xxhash64("id"), F.lit(users)).alias("user_id"),
        F.element_at(
            F.expr(_TYPES),
            (F.pmod(F.xxhash64("id", F.lit(1)), 5) + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.xxhash64("id", F.lit(2)), 2000) / 100.0).alias(
            "value"
        ),
        F.lit('{"k": 1}').alias("props"),
    )


def main() -> int:
    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 10_000_000]
    from open_tlm_spark.plans.mining_queries import (
        events_attribution_linear,
        ts_sax_symbols,
        ts_theil_sen_slope,
    )
    from open_tlm_spark.session import get_spark

    spark = get_spark("events-scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="events_smoke_")

    for n in sizes:
        path = os.path.join(tmp, f"events_{n}")
        t0 = time.time()
        synth_events(spark, n).write.mode("overwrite").parquet(path)
        t_synth = time.time() - t0
        spark.read.parquet(path).createOrReplaceTempView("events")

        print(f"\n== {n:,} events (synth+write {t_synth:.1f} s) ==")
        for name, fn in (
            ("attribution", events_attribution_linear),
            ("theil_sen", ts_theil_sen_slope),
            ("sax_motifs", ts_sax_symbols),
        ):
            t0 = time.time()
            rows = fn(spark, path)
            out = rows.collect()
            dt = time.time() - t0
            print(f"{name:12s} {dt:7.2f} s  rows={len(out)}")
            for rdd in list(
                spark.sparkContext._jsc.getPersistentRDDs().values()
            ):
                rdd.unpersist(False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
