"""Retention tests (store/retention.py): expiring aged raw
partitions must be a partition drop that leaves rollups — and
therefore every routed query over the expired range — untouched."""

import datetime


from open_tlm_spark.schemas import POINTS_SCHEMA
from open_tlm_spark.store import TelemetryStore
from open_tlm_spark.store.retention import expire_raw


def _dt(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def test_expire_raw_drops_partitions_keeps_rollups(spark, tmp_path):
    store = TelemetryStore(spark, str(tmp_path))
    for day in (1, 2, 3):
        rows = [
            ("ret.s", _dt(f"2024-01-0{day}T12:00:{i:02d}"), float(i))
            for i in range(10)
        ]
        store.put(spark.createDataFrame(rows, POINTS_SCHEMA))

    start, end = _dt("2024-01-01T00:00:00"), _dt("2024-01-04T00:00:00")

    def raw_count(day: int) -> int:
        # narrow raw windows — wide raw scans trip the T5 fan-out
        # guard by design (auto-routing would serve them)
        return store.get(
            "ret.s",
            _dt(f"2024-01-0{day}T11:59:00"),
            _dt(f"2024-01-0{day}T12:01:00"),
            None,
        ).count()

    rollup_before = sorted(
        (r.bin_ts, r["count"], r.sum_values)
        for r in store.get("ret.s", start, end, 1000).collect()
    )
    assert [raw_count(d) for d in (1, 2, 3)] == [10, 10, 10]

    # expire everything before day 3 (UTC date granularity)
    n = expire_raw(store, _dt("2024-01-03T00:00:00"))
    assert n > 0

    # raw: only day-3 points remain, and range reads still work
    assert [raw_count(d) for d in (1, 2, 3)] == [0, 0, 10]

    # rollups: byte-for-byte unaffected — the expired range still
    # serves at every fidelity (downsample-then-expire)
    rollup_after = sorted(
        (r.bin_ts, r["count"], r.sum_values)
        for r in store.get("ret.s", start, end, 1000).collect()
    )
    assert rollup_after == rollup_before
    assert len({b for b, _, _ in rollup_after}) == 3  # all 3 days

    # idempotent: nothing left to drop at the same cutoff
    assert expire_raw(store, _dt("2024-01-03T00:00:00")) == 0

    # ingest after expiry still works (fresh partitions re-appear)
    store.put(
        spark.createDataFrame(
            [("ret.s", _dt("2024-01-01T12:00:30"), 99.0)], POINTS_SCHEMA
        )
    )
    assert [raw_count(d) for d in (1, 2, 3)] == [1, 0, 10]


def test_expire_and_compact_compose(spark, tmp_path):
    """Maintenance jobs run together in production: compaction after
    expiry must not resurrect dropped days, and expiry after
    compaction must still drop whole (rewritten) partitions."""
    store = TelemetryStore(spark, str(tmp_path))
    for day in (1, 2, 3):
        for batch in range(2):  # two puts/day -> small-file buildup
            rows = [
                (
                    "rc.s",
                    _dt(f"2024-01-0{day}T1{batch}:00:0{i}"),
                    float(i),
                )
                for i in range(5)
            ]
            store.put(spark.createDataFrame(rows, POINTS_SCHEMA))

    # compact first, then expire day 1: the rewritten partitions
    # must still be droppable as directories
    store.compact()
    assert expire_raw(store, _dt("2024-01-02T00:00:00")) > 0

    def day_count(day: int) -> int:
        return store.get(
            "rc.s",
            _dt(f"2024-01-0{day}T09:00:00"),
            _dt(f"2024-01-0{day}T13:00:00"),
            None,
        ).count()

    assert [day_count(d) for d in (1, 2, 3)] == [0, 10, 10]

    # now expire day 2, then compact: the dropped day must STAY
    # dropped through the rewrite
    assert expire_raw(store, _dt("2024-01-03T00:00:00")) > 0
    store.compact()
    assert [day_count(d) for d in (1, 2, 3)] == [0, 0, 10]

    # rollups still serve all three days at every point
    bins = store.get(
        "rc.s",
        _dt("2024-01-01T00:00:00"),
        _dt("2024-01-04T00:00:00"),
        1000,
    ).collect()
    assert sum(r["count"] for r in bins) == 30
