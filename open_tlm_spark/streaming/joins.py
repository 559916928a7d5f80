"""Streaming stream-stream interval join: the real-time half of the
attribution pipeline (batch counterpart: plans/mining_queries.py
events_attribution_linear).

Spark-first design: Structured Streaming's watermarked stream-stream
join IS the operator — each side buffers only the state the
watermark + interval bound allow (touches older than
lookback + watermark are evicted), so state is bounded and the join
runs append-mode at any event rate. The credit DIVISION
(value / n_touches) is deliberately NOT done here: a purchase's
touches can emit across micro-batches, so the per-purchase fan-out
count is only complete once the watermark passes the purchase — the
landed pair table is the streaming product, and the registered batch
query computes credits over it (the canonical lambda-free split:
stream materializes the expensive association, batch derives the
cheap aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_touch_attribution(
    events_stream: DataFrame,
    lookback_seconds: int = 86_400,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Associate each purchase with the same user's view/click
    touches in the `lookback_seconds` before it, as a watermarked
    stream-stream INNER interval join (append mode).

    Input schema: event_id, ts (event time), user_id, event_type,
    value — the events table's shape, read as a stream.

    Returns the pair stream (pid, p_user, p_ts, value, touch,
    t_ts). Purchases with no touch in the window ('direct'
    attribution) are an anti-join the batch layer derives from the
    landed purchases minus landed pairs — an OUTER streaming join
    would hold null rows until the watermark closes, which adds
    latency without adding information the batch layer doesn't
    already have.

    State bound: the touch buffer keeps `lookback + watermark` of
    per-user history; the purchase buffer keeps `watermark`. Both
    evict as the watermark advances — state is O(rate x window),
    independent of stream lifetime.
    """
    p = (
        events_stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("pid"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            "value",
        )
        .withWatermark("p_ts", watermark)
    )
    t = (
        events_stream.filter(F.col("event_type").isin("view", "click"))
        .select(
            F.col("user_id").alias("t_user"),
            F.col("ts").alias("t_ts"),
            F.col("event_type").alias("touch"),
        )
        .withWatermark("t_ts", watermark)
    )
    return p.join(
        t,
        F.expr(
            f"""
            t_user = p_user
            AND t_ts >= p_ts - INTERVAL {lookback_seconds} SECONDS
            AND t_ts < p_ts
            """
        ),
    ).select("pid", "p_user", "p_ts", "value", "touch", "t_ts")


def streaming_attribution_rates(
    events_stream: DataFrame,
    lookback_seconds: int = 86_400,
    watermark: str = "10 seconds",
    window: str = "1 hour",
) -> DataFrame:
    """Chained stateful operators: the watermarked interval join
    flows DIRECTLY into a watermarked tumbling count of touches per
    channel — join state and window state in ONE query, no
    foreachBatch round-trip (Spark's multiple-stateful-operator
    support, public since 3.5 / SPARK-42376).

    Emission is append-mode: a (window, channel) row emits once the
    global watermark — the MIN across both join inputs — passes the
    window end, so it is final-by-construction (no retractions
    downstream, safe to append straight into the store)."""
    pairs = streaming_touch_attribution(
        events_stream, lookback_seconds, watermark
    )
    return (
        pairs.groupBy(
            F.window("p_ts", window).alias("w"),
            F.col("touch").alias("channel"),
        )
        .agg(F.count(F.lit(1)).alias("n_touches"))
        .select(
            F.col("w.start").alias("window_start"),
            "channel",
            "n_touches",
        )
    )
