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
