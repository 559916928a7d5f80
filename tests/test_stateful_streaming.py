"""applyInPandasWithState EWMA: the recurrence must CONTINUE across
micro-batches (state carried), matching the batch operator run on the
concatenated input."""

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from open_tlm_spark.streaming.stateful import ewma_stream


def _write(src, rows, name):
    tmp = os.path.join(src, f".{name}.tmp")
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, os.path.join(src, f"{name}.json"))


def test_ewma_state_carries_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    alpha = 0.5
    batch1 = [
        {"dataset_id": "a", "date": "2024-01-01T00:00:00", "value": 10.0},
        {"dataset_id": "a", "date": "2024-01-01T00:00:01", "value": 20.0},
    ]
    batch2 = [
        {"dataset_id": "a", "date": "2024-01-01T00:00:02", "value": 30.0},
    ]
    _write(str(src), batch1, "b1")

    stream = (
        spark.readStream.schema("dataset_id string, date string, value double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .select("dataset_id", F.to_timestamp("date").alias("ts"), "value")
    )
    q = (
        ewma_stream(stream, alpha=alpha)
        .writeStream.format("memory")
        .queryName("ewma_test")
        .outputMode("append")
        .start()
    )
    try:
        t0 = time.time()
        while time.time() - t0 < 60:
            if spark.sql("SELECT * FROM ewma_test").count() >= 2:
                break
            time.sleep(0.5)
        _write(str(src), batch2, "b2")
        while time.time() - t0 < 120:
            if spark.sql("SELECT * FROM ewma_test").count() >= 3:
                break
            time.sleep(0.5)
        rows = {
            r.value: r.ewma
            for r in spark.sql("SELECT * FROM ewma_test").collect()
        }
    finally:
        q.stop()

    # recurrence: y1=10; y2=.5*10+.5*20=15; batch2 MUST continue:
    # y3=.5*15+.5*30=22.5 (a reset state would give 30.0)
    assert rows[10.0] == pytest.approx(10.0)
    assert rows[20.0] == pytest.approx(15.0)
    assert rows[30.0] == pytest.approx(22.5)


def test_anomaly_stream_state_carries_and_flags_spike(spark, tmp_path):
    """Welford state must carry across micro-batches: a stable
    baseline in batch 1 (40 points, small spread), then a huge spike
    in batch 2 — the spike must flag with a large z-score computed
    against the batch-1 baseline, and the stable points must not."""
    from open_tlm_spark.streaming.stateful import anomaly_stream

    src = tmp_path / "src"
    src.mkdir()
    batch1 = [
        {
            "dataset_id": "a",
            "date": f"2024-01-01T00:00:{i:02d}",
            "value": 10.0 + (i % 2),  # alternates 10/11 -> sd ~0.5
        }
        for i in range(40)
    ]
    batch2 = [
        {"dataset_id": "a", "date": "2024-01-01T00:01:00", "value": 10.0},
        {"dataset_id": "a", "date": "2024-01-01T00:01:01", "value": 100.0},
    ]
    _write(str(src), batch1, "b1")

    stream = (
        spark.readStream.schema("dataset_id string, date string, value double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .select("dataset_id", F.to_timestamp("date").alias("ts"), "value")
    )
    q = (
        anomaly_stream(stream, z_threshold=3.0, min_points=30)
        .writeStream.format("memory")
        .queryName("anom_test")
        .outputMode("append")
        .start()
    )
    try:
        t0 = time.time()
        while time.time() - t0 < 60:
            if spark.table("anom_test").count() == 40:
                break
            time.sleep(0.5)
        _write(str(src), batch2, "b2")
        t0 = time.time()
        while time.time() - t0 < 60:
            if spark.table("anom_test").count() == 42:
                break
            time.sleep(0.5)
        rows = {r.ts.isoformat(): r for r in spark.table("anom_test").collect()}
        assert len(rows) == 42
        # warmup points never flag; stable post-warmup points don't either
        assert not any(
            r.is_anomaly for k, r in rows.items() if k < "2024-01-01T00:01:01"
        )
        spike = rows["2024-01-01T00:01:01"]
        # baseline mean ~10.5, sd ~0.5 -> z for 100 is enormous; the
        # exact value depends on the 41 prior points, so pin the scale
        assert spike.is_anomaly and spike.zscore > 50
        # state carried: the batch-2 stable point scored against the
        # batch-1 baseline, not a fresh one
        assert abs(rows["2024-01-01T00:01:00"].zscore) < 3.0
    finally:
        q.stop()
