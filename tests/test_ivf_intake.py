"""Streaming IVF intake (streaming/ivf_intake.py): live == batch (the
streamed index serves identically to a full build on the same
corpus), and the batch gate closes foreachBatch's at-least-once
replay hazard."""

import json
import os
import time

from pyspark.sql import functions as F

from open_tlm_spark.operators.ivf_store import IVFIndex
from open_tlm_spark.operators.similarity import as_double
from open_tlm_spark.session import load_tables
from open_tlm_spark.streaming.ivf_intake import _BatchGate, start_ivf_intake

SF = "/root/testdata/sf0.01"


def _rows(df):
    return {(r.query_id, r.vec_id, r.cos_sim, r.rank) for r in df.collect()}


def _centroids(emb):
    return emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"),
        as_double(F.col("embedding")).alias("cvec"),
    )


def test_streamed_intake_matches_full_build(spark, tmp_path):
    load_tables(spark, SF)
    emb = spark.table("embeddings")
    cents = _centroids(emb)

    # seed index with the even half; stream in the odd half as 2 files
    seed = emb.filter(F.col("vec_id") % 2 == 0)
    idx_path = str(tmp_path / "idx")
    IVFIndex.build(spark, seed, idx_path, centroids=cents)

    landing = tmp_path / "landing"
    landing.mkdir()
    odd = sorted(
        (
            (r.vec_id, [float(x) for x in r.embedding])
            for r in emb.filter(F.col("vec_id") % 2 == 1).collect()
        ),
        key=lambda x: x[0],
    )
    half = len(odd) // 2
    t0 = time.time() - 60
    for name, rows, mt in (
        ("f1.json", odd[:half], t0),
        ("f2.json", odd[half:], t0 + 10),
    ):
        p = os.path.join(str(landing), name)
        with open(p, "w") as f:
            for vid, vec in rows:
                f.write(json.dumps({"vec_id": vid, "embedding": vec}) + "\n")
        os.utime(p, (mt, mt))

    q, idx = start_ivf_intake(
        spark,
        str(landing),
        idx_path,
        str(tmp_path / "ckpt"),
        trigger_seconds=0.5,
    )
    try:
        n_total = emb.count()
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                if idx.assignments().count() == n_total:
                    break
            except Exception:
                pass  # parquet mid-write
            time.sleep(1.0)
        assert idx.assignments().count() == n_total
    finally:
        q.stop()

    full = IVFIndex.build(
        spark, emb, str(tmp_path / "full"), centroids=cents
    )
    queries = emb.filter(
        (F.col("vec_id") >= 8) & (F.col("vec_id") < 12)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    assert _rows(idx.topk(queries, k=5)) == _rows(full.topk(queries, k=5))


def test_batch_gate_blocks_replay(spark, tmp_path):
    """Replay safety is LAYERED: a replay of an applied batch id is
    skipped by the gate, and even the crash window between add() and
    gate.record() is closed — add() itself dynamic-overwrites its
    epoch partitions, so a raw double-add leaves no duplicates."""
    load_tables(spark, SF)
    emb = spark.table("embeddings")
    idx_path = str(tmp_path / "idx")
    idx = IVFIndex.build(
        spark,
        emb.filter(F.col("vec_id") < 100),
        idx_path,
        centroids=_centroids(emb),
    )
    gate = _BatchGate(os.path.join(idx_path, "intake_state.json"))
    batch = emb.filter(
        (F.col("vec_id") >= 100) & (F.col("vec_id") < 150)
    ).select("vec_id", as_double(F.col("embedding")).alias("embedding"))

    def apply(batch_id):
        gate.check_identity("stream-A")
        if gate.applied(batch_id):
            return
        epoch = gate.next_epoch()
        idx.add(batch, epoch=epoch)
        gate.record(batch_id, epoch + 1, "stream-A")

    apply(0)
    n = idx.assignments().count()
    apply(0)  # clean replay of the same micro-batch: gate skips
    assert idx.assignments().count() == n
    # CRASH WINDOW: add() landed but record() did not -> the replay
    # re-runs add() with the same epoch. Dynamic partition overwrite
    # must replace, not duplicate.
    idx.add(batch, epoch=1)
    assert idx.assignments().count() == n
    assert idx.assignments().select("vec_id").distinct().count() == n
    apply(1)  # a NEW batch id appends under its own epoch
    assert idx.assignments().count() == n + 50
    batch2 = emb.filter(
        (F.col("vec_id") >= 150) & (F.col("vec_id") < 175)
    ).select("vec_id", as_double(F.col("embedding")).alias("embedding"))
    idx.add(batch2, epoch=3)
    assert idx.assignments().count() == n + 75


def test_compact_epochs_folds_intakes(spark, tmp_path):
    """compact_epochs merges every intake epoch into epoch 0 with the
    same rows — serving results unchanged, one leaf per cell again."""
    load_tables(spark, SF)
    emb = spark.table("embeddings")
    idx = IVFIndex.build(
        spark,
        emb.filter(F.col("vec_id") < 300),
        str(tmp_path / "idx"),
        centroids=_centroids(emb),
    )
    for i, (lo, hi) in enumerate([(300, 350), (350, 400), (400, 450)]):
        idx.add(
            emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
            .select("vec_id", as_double(F.col("embedding")).alias("embedding")),
            epoch=i + 1,
        )
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    before = _rows(idx.topk(queries, k=5, nprobe=8))
    n = idx.assignments().count()
    assert idx.assignments().filter(F.col("epoch") > 0).count() == 150

    # targeted compaction returns the rows REWRITTEN — everything in
    # cells that carried intake epochs; untouched cells hardlink over
    touched = [
        int(r.centroid_id)
        for r in idx.assignments()
        .filter(F.col("epoch") > 0)
        .select("centroid_id")
        .distinct()
        .collect()
    ]
    expected = (
        idx.assignments().filter(F.col("centroid_id").isin(touched)).count()
    )
    compacted = idx.compact_epochs()
    assert compacted == expected
    assert idx.assignments().count() == n
    assert idx.assignments().filter(F.col("epoch") > 0).count() == 0
    assert _rows(idx.topk(queries, k=5, nprobe=8)) == before
    # nothing left to fold -> no new version, returns 0
    assert idx.compact_epochs() == 0


def test_identity_guard_and_monotone_epochs(tmp_path):
    """ADVICE r8: a fresh checkpoint restarts batch ids at 0, which the
    `<= last` gate would read as "already applied" — the gate must
    fail fast when a different stream identity touches an existing
    intake state, and epochs must come from the monotone counter (a
    legacy epoch=batch_id+1 state resumes PAST its last possible
    epoch, never recycling one)."""
    import pytest

    from open_tlm_spark.streaming.ivf_intake import _BatchGate

    gate = _BatchGate(str(tmp_path / "intake_state.json"))
    # fresh state: first epoch is 1, any identity may claim it
    assert gate.next_epoch() == 1
    gate.check_identity("stream-A")
    gate.record(3, 2, "stream-A")
    assert gate.applied(3) and gate.applied(0) and not gate.applied(4)
    assert gate.next_epoch() == 2

    # same stream resumes; a different stream (fresh checkpoint) fails
    gate.check_identity("stream-A")
    with pytest.raises(RuntimeError, match="fresh\ncheckpoint|checkpoint"):
        gate.check_identity("stream-B")

    # legacy state (last_batch_id only): counter resumes past the
    # largest epoch the old batch_id+1 scheme can have written
    legacy = _BatchGate(str(tmp_path / "legacy.json"))
    with open(legacy.path, "w", encoding="utf-8") as f:
        json.dump({"last_batch_id": 4}, f)
    assert legacy.next_epoch() == 6
    assert legacy.applied(4) and not legacy.applied(5)
    legacy.check_identity("any")  # no owner recorded -> adoptable


def test_checkpoint_identity_reads_nonlocal_uris(spark, tmp_path):
    """ADVICE r9: os.path probes can't see hdfs://-style checkpoint
    locations — the identity read must go through the Hadoop
    FileSystem API when given a spark handle. Pinned with a file: URI,
    which os.path.exists rejects but Hadoop resolves."""
    from open_tlm_spark.streaming.ivf_intake import _checkpoint_identity

    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    (ckpt / "metadata").write_text(json.dumps({"id": "q-abc-123"}))

    # local path: direct read
    assert _checkpoint_identity(str(ckpt)) == "q-abc-123"
    # file: URI — invisible to os.path, readable through Hadoop FS
    uri = "file://" + str(ckpt)
    assert not os.path.exists(os.path.join(uri, "metadata"))
    assert _checkpoint_identity(uri, spark) == "q-abc-123"
    # no spark handle for a non-local URI -> documented path fallback
    assert _checkpoint_identity(uri) == os.path.abspath(
        os.path.join(uri)
    )
