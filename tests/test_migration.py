"""Reference-store migration tests (tools/migrate_reference_store.py):
a store written by the REFERENCE engine itself (run unmodified from
/root/reference, nothing copied) must migrate into a TelemetryStore
that serves the identical points plus rebuilt rollups."""

from __future__ import annotations

import datetime as dt
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, "/root/reference")

from tools.migrate_reference_store import migrate


def _build_reference_store(base) -> dict[str, list[tuple[float, float]]]:
    from src.index import Index
    from src.model.data import Datapoint

    index = Index(base)
    day0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    data: dict[str, list[tuple[float, float]]] = {}
    for s in range(3):
        sid = f"mig.series.{s}"
        # fractional-microsecond timestamps (ADVICE r6): the double
        # product ts*1e6 lands just BELOW the true integer for ~1% of
        # these, so a truncating cast would migrate them 1 µs early —
        # the round-to-nearest path must keep them exact
        pts = [
            (
                (
                    day0
                    + dt.timedelta(
                        seconds=i * 2, microseconds=(i * 997 + s) % 1_000_000
                    )
                ).timestamp(),
                float(s * 1000 + i) / 10.0,
            )
            for i in range(500)
        ]
        data[sid] = pts
        index.put(
            sid,
            [
                Datapoint(
                    date=dt.datetime.fromtimestamp(
                        t, tz=dt.timezone.utc
                    ).replace(tzinfo=None).isoformat(),
                    value=v,
                )
                for t, v in pts
            ],
        )
    return data


def test_migrate_reference_store_roundtrip(spark, tmp_path):
    ref_base = tmp_path / "refstore"
    ref_base.mkdir()
    data = _build_reference_store(ref_base)

    store = migrate(spark, str(ref_base), str(tmp_path / "out"))

    # every point survives, exactly (timestamps to the microsecond)
    pts = spark.read.parquet(store.points_path).collect()
    assert len(pts) == sum(len(v) for v in data.values())
    got = {
        (r.dataset_id, r.ts.replace(tzinfo=dt.timezone.utc).timestamp(), r.value)
        for r in pts
    }
    want = {
        (sid, t, v) for sid, series in data.items() for t, v in series
    }
    assert got == want

    # catalog knows every migrated series
    names = {r.dataset_id for r in store.datasets("mig").collect()}
    assert names == set(data)

    # rollups were REBUILT: the 1000 s level accounts for every point
    start = dt.datetime(2024, 1, 1)
    end = dt.datetime(2024, 1, 2)
    for sid, series in data.items():
        bins = store.get(sid, start, end, 1000).collect()
        assert sum(r["count"] for r in bins) == len(series)
        assert abs(
            sum(r.sum_values for r in bins) - sum(v for _, v in series)
        ) < 1e-6