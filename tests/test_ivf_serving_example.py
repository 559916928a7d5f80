"""End-to-end IVF serving loop (examples/ivf_serving_pipeline.py):
streamed dual-artifact intake serves identically to a full rebuild
while MAINTENANCE compactions run concurrently from the host side
(never inside the sink — VERDICT r9), the cell probe flags a planted
hot cell as the rebuild signal, and rebuild_and_swap retrains both
artifacts in place while preserving the corpus."""

import json
import os
import time

from pyspark.sql import functions as F

from examples.ivf_serving_pipeline import (
    build_serving_indexes,
    cell_balance_report,
    rebuild_and_swap,
    rebuild_recommended,
    run_maintenance,
    serve_topk,
    start_dual_intake,
)
from open_tlm_spark.operators.similarity import as_double
from open_tlm_spark.session import load_tables

SF = "/root/testdata/sf0.01"


def _cents(emb):
    return emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"),
        as_double(F.col("embedding")).alias("cvec"),
    )


def _queries(emb):
    return emb.filter(
        (F.col("vec_id") >= 8) & (F.col("vec_id") < 12)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )


def _rows(df):
    return {(r.query_id, r.vec_id, r.cos_sim, r.rank) for r in df.collect()}


def test_serving_loop_live_equals_batch(spark, tmp_path):
    """Seed with the even half, stream the odd half in 3 files while
    the HOST-side maintenance tick compacts concurrently (the
    versioned artifacts + mutation lock make that safe — reads resolve
    the pointer, adds serialize with the compactor): once drained,
    rerank-by-default serving over the streamed artifacts must equal
    serving over a from-scratch rebuild on the full corpus (sharing
    the seed's codebook — intake encodes against the PERSISTED
    codebook, so the comparison pins exactly the intake path), at
    least one concurrent compaction must have run, and a final
    maintenance tick folds every intake epoch on both artifacts."""
    load_tables(spark, SF)
    emb = spark.table("embeddings")
    seed = emb.filter(F.col("vec_id") % 2 == 0)
    work = str(tmp_path / "serving")
    flat, pq = build_serving_indexes(
        spark, seed, work, centroids=_cents(emb), train_iters=1
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    late = sorted(
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.filter(F.col("vec_id") % 2 == 1).collect()
    )
    third = max(1, len(late) // 3)
    t0 = time.time() - 60
    for i in range(3):
        lo, hi = i * third, (i + 1) * third if i < 2 else len(late)
        p = os.path.join(str(landing), f"b{i}.json")
        with open(p, "w") as f:
            for vid, vec in late[lo:hi]:
                f.write(json.dumps({"vec_id": vid, "embedding": vec}) + "\n")
        os.utime(p, (t0 + 10 * i, t0 + 10 * i))

    q, flat, pq = start_dual_intake(
        spark,
        str(landing),
        work,
        str(tmp_path / "ckpt"),
        trigger_seconds=0.5,
    )
    compacted_live = False
    try:
        target = emb.count()
        deadline = time.time() + 120
        while time.time() < deadline:
            # no mid-write guard needed: versioned reads always
            # resolve a complete artifact (VERDICT r9 #3)
            compacted_live = (
                run_maintenance(flat, pq, max_epochs=2) or compacted_live
            )
            if (
                flat.assignments().count() == target
                and pq.codes().count() == target * 8
            ):
                break
            time.sleep(1.0)
        assert flat.assignments().count() == target
    finally:
        q.stop()

    # maintenance ran concurrently with the stream at least once, and
    # a final tick folds everything that landed after the last one
    assert compacted_live
    run_maintenance(flat, pq, max_epochs=1)
    assert flat.assignments().filter(F.col("epoch") > 0).count() == 0
    assert pq.codes().filter(F.col("epoch") > 0).count() == 0
    assert flat.assignments().count() == target

    # live == batch: a full rebuild sharing the same centroids AND the
    # streamed index's codebook serves identical rerank results
    from open_tlm_spark.operators.ivf_store import IVFIndex, IVFPQIndex

    flat_full = IVFIndex.build(
        spark, emb, str(tmp_path / "flat_full"), centroids=_cents(emb)
    )
    pq_full = IVFPQIndex.build(
        spark,
        emb,
        str(tmp_path / "pq_full"),
        centroids=_cents(emb),
        codebook=pq.codebook(),
    )
    queries = _queries(emb)
    got = _rows(serve_topk(flat, pq, queries))
    want = _rows(serve_topk(flat_full, pq_full, queries))
    assert got == want and len(got) == 20


def test_probe_flags_planted_hot_cell(spark, tmp_path):
    """Plant 70% of the corpus into one cell (duplicate one vector's
    direction): the balance probe must flag that cell with a provable
    lower bound and recommend a rebuild; a balanced index must not."""
    load_tables(spark, SF)
    emb = spark.table("embeddings")
    n = emb.count()

    flat, _ = build_serving_indexes(
        spark, emb, str(tmp_path / "balanced"), centroids=_cents(emb),
        train_iters=0,
    )
    report = cell_balance_report(flat)
    assert report.n_rows == n
    assert not rebuild_recommended(report, n_cells=8, factor=4.0)

    # skewed corpus: most vectors share one direction -> one cell
    base = emb.filter(F.col("vec_id") == 0).first().embedding
    hot = spark.range(n * 2, n * 2 + int(n * 0.7) * 3).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(float(x)) for x in base]).alias("embedding"),
    )
    skewed = emb.select(
        "vec_id", as_double(F.col("embedding")).alias("embedding")
    ).unionByName(hot)
    flat_s, _ = build_serving_indexes(
        spark, skewed, str(tmp_path / "skewed"), centroids=_cents(emb),
        train_iters=0,
    )
    report_s = cell_balance_report(flat_s)
    assert rebuild_recommended(report_s, n_cells=8, factor=4.0)


def test_rebuild_and_swap_retrains_in_place(spark, tmp_path):
    """The rebuild signal's consumer (VERDICT r9 'What's missing' #3):
    rebuild_and_swap must retrain centroids + codebook from the
    artifact's own vectors into NEW versions at the SAME paths,
    preserve the corpus exactly (same vec_id set), keep serving
    consistent top-k throughout (handles resolved before the swap
    still read the superseded version), and leave at most two version
    dirs per artifact."""
    load_tables(spark, SF)
    emb = spark.table("embeddings")
    work = str(tmp_path / "serving")
    flat, pq = build_serving_indexes(
        spark, emb, work, centroids=_cents(emb), train_iters=1
    )
    queries = _queries(emb)
    n = emb.count()
    ids_before = {r.vec_id for r in flat.assignments().select("vec_id").collect()}
    cents_before = {
        (r.centroid_id, tuple(r.cvec)) for r in flat.centroids().collect()
    }
    # a reader that resolved its plan BEFORE the swap: grace window
    pre_swap_plan = serve_topk(flat, pq, queries)

    new_flat, new_pq = rebuild_and_swap(spark, flat, pq, k=8, train_iters=1)

    # corpus preserved, centroids actually retrained
    assert new_flat.assignments().count() == n
    assert {
        r.vec_id for r in new_flat.assignments().select("vec_id").collect()
    } == ids_before
    cents_after = {
        (r.centroid_id, tuple(r.cvec)) for r in new_flat.centroids().collect()
    }
    assert cents_after != cents_before
    assert new_pq.codes().count() == n * new_pq._shape()[0]

    # serving works on the swapped artifacts AND the pre-swap reader
    # still completes against the superseded version's files
    assert len(_rows(serve_topk(new_flat, new_pq, queries))) == 20
    assert pre_swap_plan.count() == 20

    for path in (new_flat.path, new_pq.path):
        versions = [v for v in os.listdir(path) if v.startswith("v")]
        assert len(versions) <= 2, (path, versions)


def test_quantized_tier_drops_in(spark, tmp_path):
    """`build_serving_indexes(quantized=True)` swaps the refine
    artifact for the SQ8 int8 tier with NO other code change:
    `open_vector_index` re-detects the tier from disk, serving
    returns near-identical top-k to the fp64 loop, and
    rebuild_and_swap preserves the tier and the corpus."""
    from open_tlm_spark.operators.ivf_store import (
        IVFSQ8Index,
        open_vector_index,
    )

    load_tables(spark, SF)
    emb = spark.table("embeddings")
    cents = _cents(emb)
    q = _queries(emb)

    fp64 = str(tmp_path / "fp64")
    int8 = str(tmp_path / "int8")
    flat, pq = build_serving_indexes(spark, emb, fp64, centroids=cents)
    s8, pq8 = build_serving_indexes(
        spark, emb, int8, centroids=cents, quantized=True
    )
    assert isinstance(s8, IVFSQ8Index)
    # reload detects the tier from the on-disk layout
    reloaded = open_vector_index(spark, os.path.join(int8, "flat"))
    assert isinstance(reloaded, IVFSQ8Index)
    assert not isinstance(
        open_vector_index(spark, os.path.join(fp64, "flat")), IVFSQ8Index
    )

    want = {(r.query_id, r.vec_id) for r in serve_topk(flat, pq, q).collect()}
    got = {
        (r.query_id, r.vec_id)
        for r in serve_topk(reloaded, pq8, q).collect()
    }
    assert len(want & got) / len(want) >= 0.9

    # rebuild keeps the tier and the corpus (dequantized re-train)
    n0 = reloaded.assignments().count()
    new_flat, new_pq = rebuild_and_swap(spark, reloaded, pq8, k=8)
    assert isinstance(new_flat, IVFSQ8Index)
    assert new_flat.assignments().count() == n0
    assert serve_topk(new_flat, new_pq, q, nprobe=8).count() == 20


def test_rebuild_preserves_attr_sidecar(spark, tmp_path):
    """ADVICE r10 #1: rebuild_and_swap on an attrs-built index must
    carry the attribute columns AND the sidecar into the new version
    — before the fix the rebuilt version silently dropped them, so
    the first filtered serve after a rebuild raised and every
    attr-carrying intake failed its schema check."""
    from open_tlm_spark.operators.ivf_store import IVFIndex, IVFPQIndex

    load_tables(spark, SF)
    emb = spark.table("embeddings")
    attrs = emb.select("vec_id", "label")
    flat = IVFIndex.build(
        spark,
        emb,
        str(tmp_path / "flat"),
        centroids=_cents(emb),
        attrs=attrs,
    )
    pq = IVFPQIndex.build(
        spark, emb, str(tmp_path / "pq"), centroids=flat.centroids()
    )
    before = {
        (r.query_id, r.vec_id)
        for r in flat.topk(
            _queries(emb), k=5, nprobe=8, where="label = 3"
        ).collect()
    }
    new_flat, new_pq = rebuild_and_swap(spark, flat, pq, k=8, train_iters=1)
    # sidecar survived the rebuild; filtered serving still answers
    assert new_flat._attr_lines() == ["label int"]
    after = {
        (r.query_id, r.vec_id)
        for r in new_flat.topk(
            _queries(emb), k=5, nprobe=8, where="label = 3"
        ).collect()
    }
    # full fanout over the same corpus + same filter: identical ids
    # (centroids retrained, but nprobe=8 probes every cell)
    assert after == before and len(after) == 20
    # an attr-carrying intake still validates against the new version
    new_flat.add(
        emb.limit(0).select(
            "vec_id", as_double(F.col("embedding")).alias("embedding")
        ),
        epoch=1,
        attrs=attrs.limit(0),
    )


def test_build_serving_indexes_with_attrs(spark, tmp_path):
    """The deployment entry point accepts attrs: the pair it builds
    serves filtered top-k (raw and reranked) without dropping to the
    index classes directly, on either precision tier."""
    from open_tlm_spark.operators.ivf_store import topk_rerank

    load_tables(spark, SF)
    emb = spark.table("embeddings")
    attrs = emb.select("vec_id", "label")
    for quantized in (False, True):
        flat, pq = build_serving_indexes(
            spark,
            emb,
            str(tmp_path / ("q" if quantized else "f")),
            centroids=_cents(emb),
            quantized=quantized,
            attrs=attrs,
        )
        assert flat._attr_lines() == ["label int"]
        got = flat.topk(
            _queries(emb), k=5, nprobe=8, where="label = 3"
        ).count()
        assert got == 20
        rr = topk_rerank(
            pq, flat, _queries(emb), k=5, nprobe=8, where="label = 3"
        ).count()
        assert rr == 20


def test_serve_filtered_routes_to_variant(spark, tmp_path):
    """Round-13 variant routing: serve_filtered with a registered
    variant pair serves the predicate from the dedicated artifacts
    (same rows as the full artifact's auto-depth rerank at full
    fanout — both are exact over the filtered corpus), a mislabeled
    variant fails fast, and an unregistered predicate falls back to
    the auto-depth path."""
    import pytest as _pytest

    from examples.ivf_serving_pipeline import serve_filtered
    from open_tlm_spark.operators.ivf_store import IVFPQIndex

    load_tables(spark, SF)
    emb = spark.table("embeddings")
    attrs = emb.select("vec_id", (F.col("vec_id") % 4).alias("quad"))
    flat, pq = build_serving_indexes(
        spark,
        emb,
        str(tmp_path / "srv"),
        centroids=_cents(emb),
        attrs=attrs,
    )
    where = "quad = 1"
    flat_f = flat.build_filtered(str(tmp_path / "vf"), where)
    pq_f = flat.build_filtered(
        str(tmp_path / "vp"), where, cls=IVFPQIndex
    )
    q = _queries(emb)
    # full fanout + corpus-wide r: both paths are exact -> identical
    want = _rows(
        serve_filtered(flat, pq, q, where, k=5, r=4096, nprobe=8)
    )
    got = _rows(
        serve_filtered(
            flat,
            pq,
            q,
            where,
            variants={where: (flat_f, pq_f)},
            k=5,
            r=4096,
            nprobe=8,
        )
    )
    assert got == want and len(got) == 20
    # a mislabeled variant must refuse to serve
    with _pytest.raises(ValueError, match="was built for"):
        serve_filtered(
            flat, pq, q, "quad = 2", variants={"quad = 2": (flat_f, pq_f)}
        )
    # an unregistered predicate falls back to auto-depth (returns k)
    fallback = serve_filtered(
        flat, pq, q, "quad = 2", variants={where: (flat_f, pq_f)}, nprobe=8
    )
    assert fallback.count() == 20
