"""Stream-stream interval join tests (streaming/joins.py): the
streaming attribution pair stream must reproduce the batch join's
semantics — window bounds respected, cross-micro-batch matches
found via join state, no-touch purchases absent (they are the batch
layer's anti-join)."""

import json
import os

from pyspark.sql import functions as F

from open_tlm_spark.streaming import streaming_touch_attribution

_SCHEMA = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double"
)

_EVENTS = [
    # user 1: two touches inside the 1 h window, one outside, then a purchase
    {"event_id": 1, "ts": "2024-01-01T08:00:00", "user_id": 1,
     "event_type": "view", "value": 0.0},      # outside (>1 h before)
    {"event_id": 2, "ts": "2024-01-01T09:10:00", "user_id": 1,
     "event_type": "view", "value": 0.0},      # inside
    {"event_id": 3, "ts": "2024-01-01T09:50:00", "user_id": 1,
     "event_type": "click", "value": 0.0},     # inside
    {"event_id": 4, "ts": "2024-01-01T10:00:00", "user_id": 1,
     "event_type": "purchase", "value": 10.0},
    # user 2: a purchase with NO prior touch (batch layer's 'direct')
    {"event_id": 5, "ts": "2024-01-01T10:00:00", "user_id": 2,
     "event_type": "purchase", "value": 5.0},
    # user 2: a touch AFTER the purchase must not match
    {"event_id": 6, "ts": "2024-01-01T10:30:00", "user_id": 2,
     "event_type": "click", "value": 0.0},
]


_mtime_seq = [1_700_000_000]


def _write_file(d: str, rows, name: str) -> None:
    tmp = os.path.join(d, f".{name}.tmp")
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    dst = os.path.join(d, f"{name}.json")
    os.rename(tmp, dst)
    # stagger mtimes: the file source breaks ms-granularity mtime
    # ties arbitrarily, and these tests depend on arrival order
    _mtime_seq[0] += 10
    os.utime(dst, (_mtime_seq[0], _mtime_seq[0]))


def test_interval_join_matches_batch_semantics(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    # split across two files + maxFilesPerTrigger=1 so the purchase
    # arrives in a LATER micro-batch than its touches — the match
    # must come from the join's touch-side state buffer
    _write_file(str(landing), _EVENTS[:3], "a_touches")
    _write_file(str(landing), _EVENTS[3:], "b_purchases")

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(landing))
    )
    pairs = streaming_touch_attribution(stream, lookback_seconds=3600)
    q = (
        pairs.writeStream.format("memory")
        .queryName("attr_pairs")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.pid, r.touch, r.t_ts.isoformat())
        for r in spark.table("attr_pairs").collect()
    }
    assert got == {
        (4, "view", "2024-01-01T09:10:00"),
        (4, "click", "2024-01-01T09:50:00"),
    }

    # batch cross-check: the same rows come out of the equivalent
    # static interval join
    ev = spark.createDataFrame(
        [tuple(r.values()) for r in _EVENTS],
        "event_id long, ts string, user_id long, "
        "event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    t = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("touch"),
    )
    batch = p.join(
        t,
        (F.col("t_user") == F.col("p_user"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 3600 SECONDS"))
        & (F.col("t_ts") < F.col("p_ts")),
    )
    expect = {
        (r.pid, r.touch, r.t_ts.isoformat()) for r in batch.collect()
    }
    assert got == expect


def test_chained_join_then_window_agg(spark, tmp_path):
    """Multiple stateful operators in one query: interval join ->
    watermarked tumbling count. The 09:00 window must emit (append,
    final) once BOTH join inputs' watermarks pass its end — driven
    here by far-future sentinel events that join to nothing."""
    from open_tlm_spark.streaming import streaming_attribution_rates

    landing = tmp_path / "landing"
    landing.mkdir()
    _write_file(str(landing), _EVENTS, "a_data")
    # sentinels: a lone purchase + a lone touch for DISJOINT users,
    # days later — they advance both sides' watermarks without
    # producing join output
    sent = [
        {"event_id": 90, "ts": "2024-01-05T00:00:00", "user_id": 98,
         "event_type": "purchase", "value": 1.0},
        {"event_id": 91, "ts": "2024-01-05T00:00:00", "user_id": 99,
         "event_type": "click", "value": 0.0},
    ]
    _write_file(str(landing), sent, "b_sentinel")
    sent2 = [
        {"event_id": 92, "ts": "2024-01-06T00:00:00", "user_id": 98,
         "event_type": "purchase", "value": 1.0},
        {"event_id": 93, "ts": "2024-01-06T00:00:00", "user_id": 99,
         "event_type": "click", "value": 0.0},
    ]
    _write_file(str(landing), sent2, "c_sentinel2")

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(landing))
    )
    rates = streaming_attribution_rates(stream, lookback_seconds=3600)
    q = (
        rates.writeStream.format("memory")
        .queryName("attr_rates")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r.window_start.isoformat(), r.channel, r.n_touches)
        for r in spark.table("attr_rates").collect()
    }
    # purchase id 4 at 10:00 had 2 in-window touches -> the
    # [10:00, 11:00) window holds one view + one click credit
    assert ("2024-01-01T10:00:00", "view", 1) in got
    assert ("2024-01-01T10:00:00", "click", 1) in got
