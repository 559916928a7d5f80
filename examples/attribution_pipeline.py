"""End-to-end attribution: ONE semantic, two execution modes.

The lambda-architecture pair this engine's attribution family is
designed around, wired from individually-tested pieces:

  batch  — plans/mining_queries.py events_attribution_linear:
           the registered, oracle-gated query over the events table.
  live   — streaming/joins.py streaming_touch_attribution: the same
           purchase->touch association as a watermarked stream-stream
           interval join over a landing directory, pairs landed to
           parquet by foreachBatch; credits derived from the landed
           pairs by a small batch job (per-purchase fan-out is only
           complete past the watermark, so the division step belongs
           to the batch layer).

replay() pushes a whole events table through the live path in
event-time order and derive_credits() must then reproduce the batch
query's channel totals EXACTLY (same floor-half-up credit math, same
DECIMAL sums) — the equivalence test_attribution_example pins.

Usage:
    python examples/attribution_pipeline.py [SF_DIR] [WORK_DIR]
    (defaults: /root/testdata/sf0.001, ./attribution_out)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from open_tlm_spark.plans.mining_queries import _ATTR_LOOKBACK_US


def replay(spark, sf_dir: str, work_dir: str, n_files: int = 4) -> str:
    """Replay the events table through the STREAMING join: land the
    events as event-time-ordered JSON files (what a message bus
    delivers), run the interval join with Trigger.availableNow, and
    append the emitted pairs to parquet. Returns the pairs path.

    Event-time order matters: the join's watermark evicts touch
    state older than lookback+watermark, which is exactly safe when
    the stream is (approximately) time-ordered — the production
    contract for log replay."""
    from open_tlm_spark.session import load_tables
    from open_tlm_spark.streaming import streaming_touch_attribution

    load_tables(spark, sf_dir)
    landing = os.path.join(work_dir, "landing")
    pairs_path = os.path.join(work_dir, "pairs")
    os.makedirs(landing, exist_ok=True)
    ev = spark.table("events")
    n = ev.count()
    per = max(n // n_files + 1, 1)
    rows = (
        ev.orderBy("ts", "event_id")
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias(
                "ts"
            ),
            "user_id",
            "event_type",
            "value",
        )
        .toJSON()
        .collect()
    )
    for i in range(0, len(rows), per):
        tmp = os.path.join(landing, f".chunk{i:08d}.tmp")
        with open(tmp, "w") as f:
            f.write("\n".join(rows[i : i + per]))
        dst = os.path.join(landing, f"chunk{i:08d}.json")
        os.rename(tmp, dst)
        # the file source orders ties at ms mtime granularity
        # arbitrarily — stagger mtimes so replay order IS event-time
        # order (the watermark-safety contract)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    ).option("maxFilesPerTrigger", "1").json(landing)
    pairs = streaming_touch_attribution(
        stream, lookback_seconds=_ATTR_LOOKBACK_US // 1_000_000
    )
    q = (
        pairs.writeStream.format("parquet")
        .option("path", pairs_path)
        .option(
            "checkpointLocation", os.path.join(work_dir, "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return pairs_path


def derive_credits(spark, sf_dir: str, pairs_path: str):
    """Batch credit derivation over the landed pair table: linear
    split per purchase + a 'direct' anti-join for untouched
    purchases — the same floor-half-up / DECIMAL-sum math as the
    registered batch query, so the two modes agree exactly."""
    from open_tlm_spark.session import load_tables

    load_tables(spark, sf_dir)
    spark.catalog.refreshByPath(pairs_path)
    pairs = spark.read.parquet(pairs_path)
    touched = pairs.groupBy("pid", "value").agg(
        F.count(F.lit(1)).alias("n_t")
    )
    credits = pairs.join(touched.select("pid", "n_t"), "pid").select(
        F.col("touch").alias("channel"),
        "pid",
        (
            F.floor(
                F.col("value") * F.lit(1e6) / F.col("n_t") + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("credit"),
    )
    direct = (
        spark.table("events")
        .filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("pid"), "value")
        .join(pairs.select("pid").distinct(), "pid", "left_anti")
        .select(
            F.lit("direct").alias("channel"),
            "pid",
            (
                F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5))
                / F.lit(1e6)
            ).alias("credit"),
        )
    )
    return credits.unionByName(direct).groupBy("channel").agg(
        F.countDistinct("pid").alias("n_purchases"),
        F.count(F.lit(1)).alias("n_credits"),
        F.sum(F.col("credit").cast("decimal(18,6)"))
        .cast("double")
        .alias("attributed_value"),
    )


def main() -> int:
    from open_tlm_spark.plans.mining_queries import (
        events_attribution_linear,
    )
    from open_tlm_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else "./attribution_out"
    spark = get_spark("attribution-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    pairs_path = replay(spark, sf_dir, work)
    live = {
        r.channel: (r.n_purchases, r.n_credits, r.attributed_value)
        for r in derive_credits(spark, sf_dir, pairs_path).collect()
    }
    batch = {
        r.channel: (r.n_purchases, r.n_credits, r.attributed_value)
        for r in events_attribution_linear(spark, sf_dir).collect()
    }
    print(f"{'channel':10s} {'live':>28s} {'batch':>28s}")
    for ch in sorted(set(live) | set(batch)):
        print(f"{ch:10s} {str(live.get(ch)):>28s} {str(batch.get(ch)):>28s}")
    print("EXACT MATCH" if live == batch else "MISMATCH")
    return 0 if live == batch else 1


if __name__ == "__main__":
    sys.exit(main())
