"""Live quantile bands (streaming/quantiles.py): the deterministic
bottom-R sample makes the stream's estimate replay-invariant — any
micro-batch slicing holds the same sample a batch pass selects, so
counts match exactly and band values match to interpolation
arithmetic (~1 ulp)."""

import json
import os
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from open_tlm_spark.session import load_tables
from open_tlm_spark.streaming.quantiles import (
    quantile_band_batch,
    quantile_band_stream,
)

SF = "/root/testdata/sf0.01"


def _events_as_points(spark):
    load_tables(spark, SF)
    return spark.table("events").select(
        F.col("event_type").alias("dataset_id"), "ts", "value"
    )


def _band_map(rows):
    return {
        r.dataset_id: (r.n_seen, r.n_sample, r.p10, r.p50, r.p90)
        for r in rows
    }


def test_batch_estimator_tracks_exact_quantiles(spark):
    """With R=256 over ~2000 points/series the sampled band must sit
    near the exact one (sampling error ~ 1/sqrt(R)); with R >= group
    size it must EQUAL the exact percentile."""
    pts = _events_as_points(spark)
    exact = {
        r.dataset_id: (r.p10, r.p50, r.p90)
        for r in pts.groupBy("dataset_id")
        .agg(
            F.expr("percentile(value, 0.10)").alias("p10"),
            F.expr("percentile(value, 0.50)").alias("p50"),
            F.expr("percentile(value, 0.90)").alias("p90"),
        )
        .collect()
    }
    est = _band_map(quantile_band_batch(pts, r=256).collect())
    spreads = {
        k: exact[k][2] - exact[k][0] for k in exact
    }  # p90-p10 scale
    for k, (_, n_sample, p10, p50, p90) in est.items():
        assert n_sample == 256
        for got, want in zip((p10, p50, p90), exact[k]):
            assert abs(got - want) < 0.25 * spreads[k], (k, got, want)

    # R covering everything -> exact
    full = _band_map(quantile_band_batch(pts, r=10_000).collect())
    for k, (n_seen, n_sample, p10, p50, p90) in full.items():
        assert n_seen == n_sample
        assert (p10, p50, p90) == pytest.approx(exact[k], abs=1e-9)


def test_stream_matches_batch_replay_exactly(spark, tmp_path):
    """Two arrival orders (chronological halves vs interleaved) and a
    batch replay: same n_seen, same n_sample, same bands (1e-9)."""
    pts = _events_as_points(spark)
    want = _band_map(quantile_band_batch(pts, r=256).collect())

    rows = pts.select(
        "dataset_id", F.unix_micros("ts").alias("us"), "value"
    ).collect()

    def run_stream(split_fn, tag):
        landing = tmp_path / f"landing_{tag}"
        landing.mkdir()
        out = tmp_path / f"out_{tag}"
        t0 = time.time() - 60
        for i, chunk in enumerate(split_fn(rows)):
            p = os.path.join(str(landing), f"b{i}.json")
            with open(p, "w") as f:
                for r in chunk:
                    f.write(
                        json.dumps(
                            {
                                "dataset_id": r.dataset_id,
                                "us": r.us,
                                "value": r.value,
                            }
                        )
                        + "\n"
                    )
            os.utime(p, (t0 + i * 10, t0 + i * 10))
        stream = (
            spark.readStream.schema(
                "dataset_id string, us long, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .json(str(landing))
            .select(
                "dataset_id",
                F.timestamp_micros("us").alias("ts"),
                "value",
            )
        )
        q = (
            quantile_band_stream(stream, r=256)
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(tmp_path / f"ckpt_{tag}"))
            .outputMode("append")
            .trigger(processingTime="0.5 seconds")
            .start()
        )
        try:
            deadline = time.time() + 120
            latest = {}
            while time.time() < deadline:
                try:
                    got = spark.read.parquet(str(out)).collect()
                except Exception:
                    got = []
                for r in got:
                    cur = latest.get(r.dataset_id)
                    if cur is None or r.n_seen > cur.n_seen:
                        latest[r.dataset_id] = r
                if latest and all(
                    latest[k].n_seen == want[k][0] for k in want
                    if k in latest
                ) and len(latest) == len(want):
                    break
                time.sleep(1.0)
        finally:
            q.stop()
        return _band_map(latest.values())

    halves = lambda rs: (  # noqa: E731
        rs[: len(rs) // 2], rs[len(rs) // 2:]
    )
    interleave = lambda rs: (rs[0::3], rs[1::3], rs[2::3])  # noqa: E731

    for tag, split in (("halves", halves), ("tri", interleave)):
        got = run_stream(split, tag)
        assert set(got) == set(want), tag
        for k in want:
            wn, wns, wp10, wp50, wp90 = want[k]
            gn, gns, gp10, gp50, gp90 = got[k]
            assert (gn, gns) == (wn, wns), (tag, k)
            assert (gp10, gp50, gp90) == pytest.approx(
                (wp10, wp50, wp90), abs=1e-9
            ), (tag, k)
