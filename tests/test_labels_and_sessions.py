"""Tests for axis-label helpers (F10/F11) and streaming session
windows (ST4)."""

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from open_tlm_spark.functions.labels import (
    base10_interval,
    base10_labels,
    base60_interval,
    format_value,
    time_labels,
)
from open_tlm_spark.streaming import streaming_sessions


def test_base10_interval_ladder():
    # span 100 / 10 labels -> raw 10 -> nice 10
    assert base10_interval(100, 10) == 10
    assert base10_interval(30, 10) == pytest.approx(5)   # raw 3 -> 5
    assert base10_interval(11, 10) == pytest.approx(2)   # raw 1.1 -> 2
    assert base10_interval(24, 10) == pytest.approx(2.5) # raw 2.4 -> 2.5
    assert base10_interval(0.05, 10) == pytest.approx(0.005)


def test_base10_labels_ceil_to_multiple():
    assert base10_labels(0.3, 5.0, 10) == pytest.approx([0.5, 1.0, 1.5, 2.0, 2.5, 3.0, 3.5, 4.0, 4.5, 5.0])


def test_base60_ladder():
    assert base60_interval(600, 10) == 60        # 10 min span -> 1 min ticks
    assert base60_interval(3600, 10) == 600      # 1 h -> 10 min
    assert base60_interval(86400, 10) == 10800   # 1 day -> 3 h
    assert base60_interval(86400 * 30, 10) == 86400 * 5  # 30 d -> 5 d (base10 on days)
    assert time_labels(0, 600, 10)[0] == 0.0


def test_format_value():
    assert format_value(1234.5) == "1234.5"
    assert format_value(0.0001) == "1.000e-04"
    assert format_value(1e6) == "1.000e+06"
    assert format_value(0.0) == "0"


def test_streaming_sessions(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    rows = [
        {"dataset_id": "a", "date": "2024-01-01T00:00:00", "value": 1.0},
        {"dataset_id": "a", "date": "2024-01-01T00:10:00", "value": 2.0},
        # > 30 min gap -> new session
        {"dataset_id": "a", "date": "2024-01-01T01:00:00", "value": 9.0},
    ]
    tmp = src / ".s1.tmp"
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, src / "s1.json")

    stream = (
        spark.readStream.schema("dataset_id string, date string, value double")
        .json(str(src))
        .select("dataset_id", F.to_timestamp("date").alias("ts"), "value")
    )
    q = (
        streaming_sessions(stream, gap="30 minutes")
        .writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("complete")
        .start()
    )
    try:
        t0 = time.time()
        while time.time() - t0 < 60:
            if spark.sql("SELECT * FROM sessions_test").count() == 2:
                break
            time.sleep(0.5)
        got = sorted(
            (r.session_start, r.n_points, r.min_value, r.max_value)
            for r in spark.sql("SELECT * FROM sessions_test").collect()
        )
    finally:
        q.stop()
    import datetime as dt

    base = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())
    assert got == [(base, 2, 1.0, 2.0), (base + 3600, 1, 9.0, 9.0)]
