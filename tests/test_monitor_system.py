"""S11 system-metrics source — the last previously-untested §2 row.

The reference ships examples/monitor_system.py as an example-level
client (untested there too); these tests drive ours for real: the
sampler must produce valid dotted-id float metrics on this platform
(psutil OR /proc fallback), and a short live run must land JSON-lines
batch files that parse under the engine's streaming-ingest contract
(streaming/ingest.py start_file_ingest's schema) into valid points.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_sampler_emits_dotted_float_metrics():
    sys.path.insert(0, os.path.join(REPO, "examples"))
    import monitor_system

    got = monitor_system.sample()
    assert got, "no metrics on this platform — both backends failed"
    for name, v in got.items():
        assert name.startswith("system.") and "." in name
        assert isinstance(v, float)


def test_live_run_lands_ingestable_batches(tmp_path, spark):
    landing = tmp_path / "landing"
    landing.mkdir()
    # run long enough for at least one 2 s flush
    subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "examples", "monitor_system.py"),
            str(landing),
            "2.5",
        ],
        check=True,
        timeout=60,
    )
    files = [f for f in os.listdir(landing) if f.endswith(".json")]
    assert files, "no batch files flushed"
    # no half-written temp files left behind (atomic rename contract)
    assert not [f for f in os.listdir(landing) if f.endswith(".tmp")]
    # every line is one landing-format record
    for fname in files:
        with open(landing / fname) as f:
            for line in f:
                row = json.loads(line)
                assert set(row) == {"dataset_id", "date", "value"}
    # parses under the exact schema start_file_ingest uses, and the
    # date strings convert to non-null timestamps (the put() path)
    raw = (
        spark.read.schema("dataset_id string, date string, value double")
        .json(str(landing))
    )
    pts = raw.select(
        "dataset_id", F.to_timestamp("date").alias("ts"), "value"
    )
    rows = pts.collect()
    assert rows
    assert all(
        r.ts is not None and r.value is not None and r.dataset_id
        for r in rows
    )
