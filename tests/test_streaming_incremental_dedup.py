"""Incremental MinHash-LSH dedup: the streaming path must reproduce
the batch gate query (`dedup_incremental_minhash`) exactly — same
flagged docs, same first partners — when micro-batches align with the
batch query's epoch slices (epoch = doc_id % 2, intra-epoch order =
doc_id)."""

import json
import os
import time

from open_tlm_spark.plans.registry import REGISTRY
from open_tlm_spark.session import load_tables
from open_tlm_spark.streaming.incremental_dedup import (
    IncrementalDeduper,
    start_incremental_dedup,
)

SF = "/root/testdata/sf0.01"


def _flag_set(df):
    return {
        (r.doc_id, r.epoch, r.first_partner_key) for r in df.collect()
    }


def test_incremental_matches_batch_replay(spark, tmp_path):
    """Driving the deduper directly with the two epoch slices yields
    the batch query's exact output."""
    load_tables(spark, SF)
    docs = spark.table("documents").select("doc_id", "text")
    dedup = IncrementalDeduper(spark, str(tmp_path / "store"))
    dedup.process_batch(docs.filter(docs.doc_id % 2 == 0), epoch=0)
    dedup.process_batch(docs.filter(docs.doc_id % 2 == 1), epoch=1)

    want = _flag_set(REGISTRY["dedup_incremental_minhash"].fn(spark, SF))
    got = _flag_set(dedup.flags())
    assert got == want
    assert len(got) > 0  # non-vacuous: sf0.01 has near-dup arrivals


def test_batch_boundaries_do_not_change_flags(spark, tmp_path):
    """Micro-batch boundary invariance: slicing one arrival sequence
    (doc_id ascending) into 1 vs 4 micro-batches flags the same docs
    with the same partner documents — the epoch number encoded in the
    key is bookkeeping, the (dup, partner) identity is not allowed to
    move. This is the property that makes continuous intake safe to
    restart/re-trigger at any cadence."""
    load_tables(spark, SF)
    docs = spark.table("documents").select("doc_id", "text")

    one = IncrementalDeduper(spark, str(tmp_path / "one"))
    one.process_batch(docs, epoch=0)

    many = IncrementalDeduper(spark, str(tmp_path / "many"))
    for i, (lo, hi) in enumerate([(0, 125), (125, 250), (250, 375), (375, 10**9)]):
        many.process_batch(
            docs.filter((docs.doc_id >= lo) & (docs.doc_id < hi)), epoch=i
        )

    # strip the epoch part: order-preserving boundaries keep the
    # earliest partner's IDENTITY fixed even as its arrival rank moves
    def pairs(df):
        return {
            (r.doc_id, r.first_partner_key % 1_000_000_000)
            for r in df.collect()
        }

    assert pairs(one.flags()) == pairs(many.flags())


def test_streaming_file_source_end_to_end(spark, tmp_path):
    """Real readStream path: two landing files = two micro-batches;
    flags land in the store and match a direct two-batch replay."""
    landing = tmp_path / "landing"
    landing.mkdir()
    load_tables(spark, SF)
    docs = spark.table("documents").select("doc_id", "text")
    rows = sorted(
        ((r.doc_id, r.text) for r in docs.collect()), key=lambda x: x[0]
    )

    def write_file(name: str, pred, mtime: float):
        path = os.path.join(str(landing), name)
        with open(path, "w") as f:
            for doc_id, text in rows:
                if pred(doc_id):
                    f.write(
                        json.dumps({"doc_id": doc_id, "text": text}) + "\n"
                    )
        # FileStreamSource orders by ms mtime with ARBITRARY ties —
        # stagger explicitly so batch order is deterministic
        os.utime(path, (mtime, mtime))

    t0 = time.time() - 60
    write_file("epoch0.json", lambda d: d % 2 == 0, t0)
    write_file("epoch1.json", lambda d: d % 2 == 1, t0 + 10)

    q, dedup = start_incremental_dedup(
        spark,
        str(landing),
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
        trigger_seconds=0.5,
    )
    try:
        deadline = time.time() + 120
        want = _flag_set(
            REGISTRY["dedup_incremental_minhash"].fn(spark, SF)
        )
        got = set()
        while time.time() < deadline:
            try:
                got = _flag_set(dedup.flags())
            except Exception:
                pass  # flags parquet mid-write
            if got == want:
                break
            time.sleep(1.0)
        assert got == want
    finally:
        q.stop()


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """ADVICE r7: foreachBatch is at-least-once — a batch whose writes
    landed but whose checkpoint did not commit is re-run with the SAME
    epoch. The replay must (a) not flag docs against their own earlier
    attempt's bands, and (b) replace its epoch partition rather than
    appending a second copy of every row."""
    load_tables(spark, SF)
    docs = spark.table("documents").select("doc_id", "text")
    dedup = IncrementalDeduper(spark, str(tmp_path / "store"))

    dedup.process_batch(docs.filter(docs.doc_id % 2 == 0), epoch=0)
    dedup.process_batch(docs.filter(docs.doc_id % 2 == 1), epoch=1)
    want_flags = _flag_set(dedup.flags())
    want_bands = dedup._stored_bands().count()

    # crash-replay of the LAST batch (writes landed, checkpoint lost)
    dedup.process_batch(docs.filter(docs.doc_id % 2 == 1), epoch=1)
    assert _flag_set(dedup.flags()) == want_flags
    assert dedup._stored_bands().count() == want_bands

    # and the result still matches the batch gate query
    want = _flag_set(REGISTRY["dedup_incremental_minhash"].fn(spark, SF))
    assert _flag_set(dedup.flags()) == want
