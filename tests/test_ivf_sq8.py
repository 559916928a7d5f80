"""SQ8 quantized IVF tier + filtered ANN (operators/ivf_store.py).

The int8 tier (`IVFSQ8Index`) stores each normalized vector as dim
int8 codes + one fp64 scale through the SAME versioned artifact
machinery as the flat index (one `_storage_rows` hook overridden),
and must serve near-flat recall; attribute columns persisted at
build (`build(attrs=...)`) let `topk(where=...)` filter INSIDE the
parquet scan (PushedFilters, pre-filter semantics) — the filtered
top-k at full fanout IS brute force over the filtered corpus.
"""

import os
import subprocess

import pytest
from pyspark.sql import functions as F

from open_tlm_spark.operators.ivf_store import (
    IVFIndex,
    IVFPQIndex,
    IVFSQ8Index,
    topk_rerank,
)
from open_tlm_spark.operators.similarity import as_double, brute_force_topk
from open_tlm_spark.session import load_tables

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb_cents(spark):
    load_tables(spark, SF)
    emb = spark.table("embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"),
        as_double(F.col("embedding")).alias("cvec"),
    )
    return emb, cents


@pytest.fixture(scope="module")
def sq8_flat(spark, tmp_path_factory, emb_cents):
    emb, cents = emb_cents
    root = tmp_path_factory.mktemp("sq8")
    flat = IVFIndex.build(spark, emb, str(root / "flat"), centroids=cents)
    sq8 = IVFSQ8Index.build(spark, emb, str(root / "sq8"), centroids=cents)
    return sq8, flat, emb


def _queries(emb, lo=8, hi=12):
    return emb.filter(
        (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )


def _ids(df):
    return {(r.query_id, r.vec_id) for r in df.collect()}


# ------------------------------------------------------------- SQ8 tier


def test_sq8_near_flat_recall(spark, sq8_flat):
    """Quantization to int8 must cost almost nothing on ranking:
    recall@5 vs the exact flat serve >= 0.95 over 40 queries (the
    per-dot perturbation is ~1e-3 on unit vectors; measured 0.99
    on the gate embeddings)."""
    sq8, flat, emb = sq8_flat
    q = _queries(emb, 8, 48)
    want = _ids(flat.topk(q, k=5, nprobe=2))
    got = _ids(sq8.topk(q, k=5, nprobe=2))
    assert len(want & got) / len(want) >= 0.95


def test_sq8_probe_prunes_to_queried_cells(spark, sq8_flat):
    """The dequantizing projection must not block dynamic partition
    pruning: the SQ8 probe's scan carries the same cell subquery in
    PartitionFilters as the flat index's (the 100 TB contract)."""
    sq8, _, emb = sq8_flat
    out = sq8.topk(_queries(emb, 8, 9), k=5)
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert any(
        "PartitionFilters" in l
        and "dynamicpruningexpression(centroid_id" in l
        for l in plan.splitlines()
    ), plan


def test_sq8_incremental_add_matches_full_build(
    spark, tmp_path, emb_cents
):
    """Quantization is deterministic per row, so intaking the corpus
    in two slices through the inherited add() serves bit-identically
    to a full build — the SQ8 twin of the flat/PQ pins."""
    emb, cents = emb_cents
    full = IVFSQ8Index.build(
        spark, emb, str(tmp_path / "full"), centroids=cents
    )
    inc = IVFSQ8Index.build(
        spark,
        emb.filter(F.col("vec_id") < 300),
        str(tmp_path / "inc"),
        centroids=cents,
    )
    inc.add(
        emb.filter(F.col("vec_id") >= 300).select(
            "vec_id", as_double(F.col("embedding")).alias("embedding")
        ),
        epoch=1,
    )
    q = _queries(emb)
    want = {
        (r.query_id, r.vec_id, r.cos_sim, r.rank)
        for r in full.topk(q, k=5, nprobe=8).collect()
    }
    got = {
        (r.query_id, r.vec_id, r.cos_sim, r.rank)
        for r in inc.topk(q, k=5, nprobe=8).collect()
    }
    assert got == want


def test_sq8_compact_and_delete(spark, tmp_path, emb_cents):
    """The inherited maintenance path rewrites QUANTIZED rows (never a
    silently-dequantized fp64 copy): after compact_epochs the folded
    artifact still reads through the SQ8 schema and serves
    identically; delete propagates."""
    emb, cents = emb_cents
    idx = IVFSQ8Index.build(
        spark,
        emb.filter(F.col("vec_id") < 400),
        str(tmp_path / "m"),
        centroids=cents,
    )
    idx.add(
        emb.filter(F.col("vec_id") >= 400).select(
            "vec_id", as_double(F.col("embedding")).alias("embedding")
        ),
        epoch=1,
    )
    q = _queries(emb)
    before = {
        (r.query_id, r.vec_id, r.cos_sim, r.rank)
        for r in idx.topk(q, k=5, nprobe=8).collect()
    }
    assert idx.compact_epochs() > 0
    assert idx.intake_epochs() == set()
    # storage stayed int8: the raw rows still carry qv8 + scale
    assert {"qv8", "scale"} <= set(idx._data().columns)
    after = {
        (r.query_id, r.vec_id, r.cos_sim, r.rank)
        for r in idx.topk(q, k=5, nprobe=8).collect()
    }
    assert after == before

    victims = sorted({v for _, v in _ids(idx.topk(q, k=5, nprobe=8))})[:3]
    assert idx.delete(victims) == 3
    served = {v for _, v in _ids(idx.topk(q, k=10, nprobe=8))}
    assert not (served & set(victims))


def test_sq8_bytes_well_below_flat(spark, sq8_flat):
    """The point of the tier: the int8 artifact must be a small
    fraction of the fp64 one. At this tiny sf the parquet footer
    overhead dominates (one file per (cell, epoch) leaf), so pin a
    conservative 2x here; the honest at-scale ratio is measured at
    200k vectors in SCALE.md."""
    sq8, flat, _ = sq8_flat

    def du(p):
        return int(subprocess.check_output(["du", "-sb", p]).split()[0])

    assert du(sq8.data_path) * 2 < du(flat.data_path)


def test_rerank_fetch_from_sq8(spark, tmp_path, emb_cents):
    """`topk_rerank` accepts an SQ8 index as the refine source: the
    candidate fetch reads int8 rows (~1/8 the bytes of the fp64
    fetch) and still prunes to the probed cells; the re-ranked
    top-5 must match the fp64-refined top-5 on >= 90% of slots
    (score perturbation ~1e-3)."""
    emb, cents = emb_cents
    flat = IVFIndex.build(spark, emb, str(tmp_path / "f"), centroids=cents)
    sq8 = IVFSQ8Index.build(spark, emb, str(tmp_path / "s"), centroids=cents)
    pq = IVFPQIndex.build(spark, emb, str(tmp_path / "p"), centroids=cents)
    q = _queries(emb, 8, 28)
    want = _ids(topk_rerank(pq, flat, q, k=5, r=30, nprobe=2))
    out = topk_rerank(pq, sq8, q, k=5, r=30, nprobe=2)
    got = _ids(out)
    assert len(want & got) / len(want) >= 0.9
    # the dequantized fetch still prunes to the probed cells
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    plan = out._jdf.queryExecution().executedPlan().toString()
    pruned = [
        l
        for l in plan.splitlines()
        if "PartitionFilters" in l and "assignments8" in l
    ]
    assert pruned and all(
        "dynamicpruningexpression" in l or "centroid_id" in l
        for l in pruned
    ), plan


# --------------------------------------------------------- filtered ANN


@pytest.fixture(scope="module")
def attr_idx(spark, tmp_path_factory, emb_cents):
    emb, cents = emb_cents
    attrs = emb.select("vec_id", "label")
    path = str(tmp_path_factory.mktemp("fann") / "idx")
    idx = IVFIndex.build(spark, emb, path, centroids=cents, attrs=attrs)
    return idx, emb


def test_filtered_full_fanout_equals_bruteforce(spark, attr_idx):
    """Pre-filter semantics, exactly: topk(where=P) at nprobe=n_cells
    must equal brute-force top-k over the corpus subset satisfying P
    (same rounding, same tiebreaks) — never k unfiltered results
    thinned afterwards."""
    idx, emb = attr_idx
    q = _queries(emb)
    want = {
        (r.query_id, r.vec_id, r.cos_sim, r.rank)
        for r in brute_force_topk(
            emb.filter(F.col("label") == 3), q, k=5
        ).collect()
    }
    got = {
        (r.query_id, r.vec_id, r.cos_sim, r.rank)
        for r in idx.topk(q, k=5, nprobe=8, where="label = 3").collect()
    }
    assert got == want and len(got) > 0


def test_filtered_predicate_reaches_the_scan(spark, attr_idx):
    """The 100 TB contract for filtered ANN: the attribute predicate
    must be PUSHED into the parquet scan (PushedFilters on label),
    composing with the cell subquery's PartitionFilters — one pruned
    scan, no per-query corpus join for attributes."""
    idx, emb = attr_idx
    out = idx.topk(_queries(emb, 8, 9), k=5, where=F.col("label") == 3)
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    plan = out._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    assert any(
        "PushedFilters" in l and "EqualTo(label,3)" in l for l in lines
    ), plan
    assert any(
        "PartitionFilters" in l
        and "dynamicpruningexpression(centroid_id" in l
        for l in lines
    ), plan


def test_filtered_recall_monotone_in_nprobe(spark, attr_idx):
    """Under a selective filter nprobe is the recall knob, same as
    unfiltered: more probed cells never lose filtered candidates."""
    idx, emb = attr_idx
    q = _queries(emb, 8, 28)
    truth = {}
    for r in brute_force_topk(
        emb.filter(F.col("label") == 3), q, k=5
    ).collect():
        truth.setdefault(r.query_id, set()).add(r.vec_id)

    def recall(np_):
        hits = total = 0
        for r in idx.topk(q, k=5, nprobe=np_, where="label = 3").collect():
            total += 1
            hits += r.vec_id in truth.get(r.query_id, set())
        return hits / max(total, 1)

    r1, r4, r8 = recall(1), recall(4), recall(8)
    assert r1 <= r4 <= r8 == 1.0


def test_attrs_survive_add_compact_delete(spark, tmp_path, emb_cents):
    """Attribute columns are part of the artifact contract: intake
    must supply them, compaction and delete must carry both the
    columns and the sidecar schema into the new version, and filtered
    serving stays correct across the whole maintenance cycle."""
    emb, cents = emb_cents
    attrs = emb.select("vec_id", "label")
    idx = IVFIndex.build(
        spark,
        emb.filter(F.col("vec_id") < 400),
        str(tmp_path / "a"),
        centroids=cents,
        attrs=attrs.filter(F.col("vec_id") < 400),
    )
    late = emb.filter(F.col("vec_id") >= 400)
    # intake without the attrs the index was built with: fail fast
    with pytest.raises(ValueError):
        idx.add(late.select("vec_id", "embedding"), epoch=1)
    idx.add(
        late.select(
            "vec_id", as_double(F.col("embedding")).alias("embedding")
        ),
        epoch=1,
        attrs=attrs.filter(F.col("vec_id") >= 400),
    )
    q = _queries(emb)

    def filtered():
        return {
            (r.query_id, r.vec_id, r.cos_sim, r.rank)
            for r in idx.topk(
                q, k=5, nprobe=8, where="label = 3"
            ).collect()
        }

    want = {
        (r.query_id, r.vec_id, r.cos_sim, r.rank)
        for r in brute_force_topk(
            emb.filter(F.col("label") == 3), q, k=5
        ).collect()
    }
    assert filtered() == want
    assert idx.compact_epochs() > 0
    assert idx._attr_ddl()  # sidecar carried into the new version
    assert filtered() == want
    victims = sorted({v for (_, v, _, _) in want})[:2]
    assert idx.delete(victims) == 2
    assert idx._attr_ddl()
    after = filtered()
    assert not ({v for (_, v, _, _) in after} & set(victims))


def test_filtered_rerank_full_fanout_equals_filtered_brute(
    spark, tmp_path, emb_cents
):
    """Filtered rerank: the predicate applies at the refine fetch
    (the PQ codes carry no attributes), so with nprobe = n_cells and
    r >= |corpus| the result is exactly brute force over the
    FILTERED corpus — the filtered twin of the unfiltered full-
    fanout pin. The fetch scan must still prune AND push the
    predicate."""
    emb, cents = emb_cents
    attrs = emb.select("vec_id", "label")
    flat = IVFIndex.build(
        spark, emb, str(tmp_path / "f"), centroids=cents, attrs=attrs
    )
    pq = IVFPQIndex.build(spark, emb, str(tmp_path / "p"), centroids=cents)
    q = _queries(emb)
    n = emb.count()
    want = {
        (r.query_id, r.vec_id, r.cos_sim, r.rank)
        for r in brute_force_topk(
            emb.filter(F.col("label") == 3), q, k=5
        ).collect()
    }
    out = topk_rerank(
        pq, flat, q, k=5, r=n, nprobe=8, where="label = 3"
    )
    got = {
        (r.query_id, r.vec_id, r.cos_sim, r.rank) for r in out.collect()
    }
    assert got == want and len(got) > 0
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    plan = out._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    assert any(
        "PushedFilters" in l and "EqualTo(label,3)" in l for l in lines
    ), plan


def test_attr_name_collision_fails_fast(spark, tmp_path, emb_cents):
    """An attribute named like a storage column (`epoch`, `scale`,
    `nvec`...) would silently shadow it in the artifact — the build
    must refuse instead."""
    emb, cents = emb_cents
    for cls, bad in (
        (IVFIndex, "epoch"),
        (IVFIndex, "nvec"),
        (IVFIndex, "centroid_id"),
        (IVFSQ8Index, "scale"),  # reserved on the SQ8 tier only
        (IVFSQ8Index, "qv8"),
    ):
        with pytest.raises(ValueError, match="collide"):
            cls.build(
                spark,
                emb,
                str(tmp_path / f"{cls.__name__}_{bad}"),
                centroids=cents,
                attrs=emb.select("vec_id", F.col("label").alias(bad)),
            )


def test_attrs_with_comma_bearing_types(spark, tmp_path, emb_cents):
    """The attribute sidecar is line-delimited because DDL type
    strings may contain commas: a decimal(10,2) attribute must
    round-trip through build -> reload -> filtered serve -> intake
    validation without mis-splitting the schema."""
    emb, cents = emb_cents
    attrs = emb.select(
        "vec_id",
        (F.col("label").cast("decimal(10,2)") / 2).alias("tier"),
        "label",
    )
    idx = IVFIndex.build(
        spark,
        emb.filter(F.col("vec_id") < 400),
        str(tmp_path / "d"),
        centroids=cents,
        attrs=attrs.filter(F.col("vec_id") < 400),
    )
    reloaded = IVFIndex(spark, str(tmp_path / "d"))
    got = reloaded.topk(
        _queries(emb), k=5, nprobe=8, where="tier >= 1.5"
    ).collect()
    assert got  # filtered serve works through the reloaded schema
    # intake validation parses the line-delimited sidecar correctly
    late = emb.filter(F.col("vec_id") >= 400)
    with pytest.raises(ValueError):
        reloaded.add(
            late.select(
                "vec_id", as_double(F.col("embedding")).alias("embedding")
            ),
            epoch=1,
            attrs=late.select("vec_id", "label"),  # missing `tier`
        )
    reloaded.add(
        late.select(
            "vec_id", as_double(F.col("embedding")).alias("embedding")
        ),
        epoch=1,
        attrs=attrs.filter(F.col("vec_id") >= 400),
    )
    assert reloaded.assignments().filter(F.col("epoch") == 1).count() > 0


def test_sq8_filtered_matches_flat_filtered(spark, tmp_path, emb_cents):
    """Attributes + quantization compose: the SQ8 filtered serve
    returns the same ids as the flat filtered serve (>= 95% of
    slots) through its own pushed-down scan."""
    emb, cents = emb_cents
    attrs = emb.select("vec_id", "label")
    flat = IVFIndex.build(
        spark, emb, str(tmp_path / "f"), centroids=cents, attrs=attrs
    )
    sq8 = IVFSQ8Index.build(
        spark, emb, str(tmp_path / "s"), centroids=cents, attrs=attrs
    )
    q = _queries(emb, 8, 28)
    want = _ids(flat.topk(q, k=5, nprobe=8, where="label = 3"))
    got = _ids(sq8.topk(q, k=5, nprobe=8, where="label = 3"))
    assert len(want & got) / len(want) >= 0.95


def test_intake_attr_type_drift_fails_fast(spark, tmp_path, emb_cents):
    """add() compares full 'name type' sidecar entries (ADVICE r10
    #2): an intake whose attr column matches by NAME but drifted in
    TYPE would land epoch>0 parquet whose physical type conflicts
    with the pinned read schema — the failure must surface at add(),
    not later as a parquet conversion error at serve/compact time."""
    emb, cents = emb_cents
    attrs = emb.select("vec_id", "label")  # label: int
    idx = IVFIndex.build(
        spark,
        emb.filter(F.col("vec_id") < 400),
        str(tmp_path / "t"),
        centroids=cents,
        attrs=attrs.filter(F.col("vec_id") < 400),
    )
    late = emb.filter(F.col("vec_id") >= 400)
    with pytest.raises(ValueError, match="name type"):
        idx.add(
            late.select(
                "vec_id", as_double(F.col("embedding")).alias("embedding")
            ),
            epoch=1,
            attrs=late.select(
                "vec_id", F.col("label").cast("bigint").alias("label")
            ),
        )
    # the same values at the right type go through
    idx.add(
        late.select(
            "vec_id", as_double(F.col("embedding")).alias("embedding")
        ),
        epoch=1,
        attrs=attrs.filter(F.col("vec_id") >= 400),
    )
    assert idx.assignments().filter(F.col("epoch") == 1).count() > 0


def test_duplicate_attr_vec_ids_fail_fast(spark, tmp_path, emb_cents):
    """The attrs left-join guard (ADVICE r10 #3): duplicate vec_id
    rows in attrs would silently DUPLICATE corpus vectors in the
    artifact (one (query_id, vec_id) pair on several ranks) — build
    and add must both refuse."""
    emb, cents = emb_cents
    attrs = emb.select("vec_id", "label")
    dup = attrs.unionByName(attrs.limit(5))
    with pytest.raises(ValueError, match="unique"):
        IVFIndex.build(
            spark, emb, str(tmp_path / "dup"), centroids=cents, attrs=dup
        )
    idx = IVFIndex.build(
        spark,
        emb.filter(F.col("vec_id") < 400),
        str(tmp_path / "ok"),
        centroids=cents,
        attrs=attrs.filter(F.col("vec_id") < 400),
    )
    late = emb.filter(F.col("vec_id") >= 400)
    late_attrs = attrs.filter(F.col("vec_id") >= 400)
    with pytest.raises(ValueError, match="unique"):
        idx.add(
            late.select(
                "vec_id", as_double(F.col("embedding")).alias("embedding")
            ),
            epoch=1,
            attrs=late_attrs.unionByName(late_attrs.limit(3)),
        )


def test_filtered_rerank_auto_depth_returns_k(spark, tmp_path, emb_cents):
    """Automatic candidate depth (VERDICT r10 'What's missing' #3):
    under a ~1/64-selective predicate, DEFAULT arguments must return
    the full k per query — the measured starvation mode was r=50
    candidates of which <1 survives the filter. auto_depth divides r
    by the estimated selectivity (memoized narrow scan), so the
    filtered survivors reach k; auto_depth=False reproduces the
    starved behavior, pinning that the default actually does the
    work."""
    emb, cents = emb_cents
    attrs = emb.select(
        "vec_id", (F.col("vec_id") % 64).alias("bucket")
    )
    flat = IVFIndex.build(
        spark, emb, str(tmp_path / "f"), centroids=cents, attrs=attrs
    )
    pq = IVFPQIndex.build(spark, emb, str(tmp_path / "p"), centroids=cents)
    q = _queries(emb)
    want = {
        (r.query_id, r.vec_id, r.cos_sim, r.rank)
        for r in brute_force_topk(
            emb.filter(F.col("vec_id") % 64 == 3), q, k=5
        ).collect()
    }
    assert len(want) == 20  # 4 queries x full k — no shortage at truth
    got = {
        (r.query_id, r.vec_id, r.cos_sim, r.rank)
        for r in topk_rerank(
            pq, flat, q, k=5, nprobe=8, where="bucket = 3"
        ).collect()
    }
    assert got == want  # default args: no starvation
    starved = topk_rerank(
        pq, flat, q, k=5, nprobe=8, where="bucket = 3", auto_depth=False
    ).count()
    assert starved < len(want)  # the mode auto_depth exists to fix


def test_filtered_rerank_depth_cap_warns(spark, tmp_path, emb_cents):
    """Past max_r the scaled depth stops growing (the candidate frame
    is broadcast — unbounded depth would blow it before it fixed
    recall): the cap emits a UserWarning naming the shortfall instead
    of silently under-returning."""
    emb, cents = emb_cents
    attrs = emb.select(
        "vec_id", (F.col("vec_id") % 64).alias("bucket")
    )
    flat = IVFIndex.build(
        spark, emb, str(tmp_path / "f"), centroids=cents, attrs=attrs
    )
    pq = IVFPQIndex.build(spark, emb, str(tmp_path / "p"), centroids=cents)
    with pytest.warns(UserWarning, match="capped"):
        topk_rerank(
            pq,
            flat,
            _queries(emb),
            k=5,
            nprobe=8,
            where="bucket = 3",
            max_r=10,
        )


def test_selectivity_estimate_never_reads_vectors(spark, tmp_path, emb_cents):
    """`estimate_filter_selectivity`'s one-off scan must be NARROW:
    parquet column pruning keeps the vector column (nvec — 512 B/row
    at dim=64, the artifact's dominant bytes) out of the read schema,
    so the estimate costs footer + attr pages even at corpus scale."""
    emb, cents = emb_cents
    attrs = emb.select("vec_id", "label")
    idx = IVFIndex.build(
        spark, emb, str(tmp_path / "sel"), centroids=cents, attrs=attrs
    )
    pred = F.col("label") == 3
    attr_cols = [ln.split(" ", 1)[0] for ln in idx._attr_lines()]
    base = idx._data().select("vec_id", *attr_cols)
    agg = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(pred, F.lit(1))).alias("m"),
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    scans = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scans, plan
    assert all("nvec" not in l for l in scans), plan
    # and the estimate itself is sane on this artifact
    sel = idx.estimate_filter_selectivity(pred)
    assert 0.05 < sel < 0.2  # one of 10 labels


def test_selectivity_memo_invalidates_on_intake(spark, tmp_path, emb_cents):
    """The selectivity memo keys on the on-disk epoch set, not just
    the version: add() lands epochs WITHOUT a version bump, so a
    version-only memo would keep serving the pre-intake estimate —
    a skewed intake (here: every new vector fails the predicate)
    must move the estimate on the next call."""
    emb, cents = emb_cents
    attrs = emb.select(
        "vec_id", (F.col("vec_id") % 2).alias("parity")
    )
    idx = IVFIndex.build(
        spark,
        emb.filter(F.col("vec_id") % 2 == 0),  # parity-0 only
        str(tmp_path / "memo"),
        centroids=cents,
        attrs=attrs.filter(F.col("vec_id") % 2 == 0),
    )
    before = idx.estimate_filter_selectivity("parity = 0")
    assert before == 1.0  # the whole corpus matches
    # intake ONLY parity-1 vectors: the true selectivity drops
    odd = emb.filter(F.col("vec_id") % 2 == 1)
    idx.add(
        odd.select(
            "vec_id", as_double(F.col("embedding")).alias("embedding")
        ),
        epoch=1,
        attrs=attrs.filter(F.col("vec_id") % 2 == 1),
    )
    after = idx.estimate_filter_selectivity("parity = 0")
    assert 0.4 < after < 0.6  # re-estimated over the grown corpus
    # and a truncating mutation (compaction) changes the key again
    # without changing the value
    assert idx.compact_epochs() > 0
    assert abs(idx.estimate_filter_selectivity("parity = 0") - after) < 1e-9


def test_filtered_rerank_cell_correlated_attr_returns_k(
    spark, tmp_path, emb_cents
):
    """Per-probed-cell depth (VERDICT r11 'What's missing' #3): the
    r11 smoke's `bucket = vec_id % M` predicate is geometry-
    INDEPENDENT by construction, so the global selectivity estimate
    happened to be right. Here the attribute is a function of cell
    geometry — `hit` is 1 everywhere EXCEPT the query's own cell,
    where only 8 vectors carry it — so the global fraction (~0.9)
    says depth is fine while the probed cell is ~87% matchless.
    Everything is deterministic (fixed data, fixed centroids, exact
    ADC), so the contrast is a pin, not a coin flip: the per-cell
    rule must return the TRUE filtered top-k, and the old global
    rule (simulated via auto_depth=False at the global-depth r)
    must starve."""
    import math

    from open_tlm_spark.operators.similarity import ivf_assign_slim

    emb, cents = emb_cents
    assign = ivf_assign_slim(emb, cents).select("vec_id", "centroid_id")
    c_star = int(
        assign.filter(F.col("vec_id") == 8).first().centroid_id
    )
    star_rows = (
        assign.filter(
            (F.col("centroid_id") == c_star)
            & (~F.col("vec_id").between(8, 11))
        )
        .orderBy("vec_id")
        .limit(8)
        .collect()
    )
    hit_ids = [int(r.vec_id) for r in star_rows]
    assert len(hit_ids) == 8
    attrs = assign.select(
        "vec_id",
        F.when(
            (F.col("centroid_id") != c_star)
            | F.col("vec_id").isin(hit_ids),
            1,
        )
        .otherwise(0)
        .alias("hit"),
    )
    flat = IVFIndex.build(
        spark, emb, str(tmp_path / "f"), centroids=cents, attrs=attrs
    )
    pq = IVFPQIndex.build(spark, emb, str(tmp_path / "p"), centroids=cents)
    q8 = _queries(emb, 8, 9)
    # truth: full candidate fan-out of the probed cell, then filter +
    # exact rerank == brute force over the cell's filtered rows
    want = {
        (r.query_id, r.vec_id, r.cos_sim, r.rank)
        for r in topk_rerank(
            pq, flat, q8, k=5, nprobe=1, where="hit = 1",
            auto_depth=False, r=10**5,
        ).collect()
    }
    assert len(want) == 5  # 8 matching rows in the cell: k is reachable
    # the per-cell estimate SEES the starved cell the global one hides
    by_cell = flat.estimate_filter_selectivity_by_cell("hit = 1")
    global_sel = flat.estimate_filter_selectivity("hit = 1")
    assert by_cell[c_star] < 0.2 < 0.8 < global_sel
    # default auto_depth with small r: per-query depth divides by the
    # probed cell's min selectivity -> full k, exactly the truth
    got = {
        (r.query_id, r.vec_id, r.cos_sim, r.rank)
        for r in topk_rerank(
            pq, flat, q8, k=5, r=8, nprobe=1, where="hit = 1"
        ).collect()
    }
    assert got == want
    # the r11 GLOBAL rule at the same r would have starved this query
    r_global = math.ceil(8 / global_sel)
    starved = topk_rerank(
        pq, flat, q8, k=5, r=r_global, nprobe=1, where="hit = 1",
        auto_depth=False,
    ).count()
    assert starved < 5


def test_selectivity_resolves_partition_columns(spark, tmp_path, emb_cents):
    """ADVICE r11 #1: the estimate's narrow projection carries the
    partition columns (centroid_id, epoch — directory-derived, zero
    data pages), so a `where` over them resolves here exactly as it
    does at the fetch filter, even on an ATTRIBUTE-FREE index."""
    emb, cents = emb_cents
    idx = IVFIndex.build(spark, emb, str(tmp_path / "p"), centroids=cents)
    assert idx.attr_columns() == []  # the new public accessor
    assert idx.estimate_filter_selectivity("epoch = 0") == 1.0
    assert 0.0 < idx.estimate_filter_selectivity("centroid_id < 4") < 1.0


def test_rerank_unresolvable_predicate_falls_back(spark, tmp_path, emb_cents):
    """ADVICE r11 #1 (fallback half): a predicate that resolves at
    the fetch but not in the narrow projection must not fail the
    query — auto_depth warns and uses r verbatim."""
    emb, cents = emb_cents
    flat = IVFIndex.build(spark, emb, str(tmp_path / "f"), centroids=cents)
    pq = IVFPQIndex.build(spark, emb, str(tmp_path / "p"), centroids=cents)
    with pytest.warns(UserWarning, match="verbatim"):
        out = topk_rerank(
            pq, flat, _queries(emb), k=5, where="size(nvec) = 64"
        )
    assert out.count() == 20  # the all-true predicate serves normally


def test_selectivity_cache_evicts_stale_states(spark, tmp_path, emb_cents):
    """ADVICE r11 #3: the memo replaces a (path, predicate) entry on
    artifact-state change instead of accreting one dead entry per
    mutation — a long-lived serving host's cache is bounded by its
    live (path, predicate) pairs."""
    from open_tlm_spark.operators.ivf_store import _SELECTIVITY_CACHE

    emb, cents = emb_cents
    attrs = emb.select("vec_id", "label")
    idx = IVFIndex.build(
        spark,
        emb.filter(F.col("vec_id") < 400),
        str(tmp_path / "c"),
        centroids=cents,
        attrs=attrs.filter(F.col("vec_id") < 400),
    )
    idx.estimate_filter_selectivity("label = 3")
    n0 = len(_SELECTIVITY_CACHE)
    idx.add(
        emb.filter(F.col("vec_id") >= 400).select(
            "vec_id", as_double(F.col("embedding")).alias("embedding")
        ),
        epoch=1,
        attrs=attrs.filter(F.col("vec_id") >= 400),
    )
    idx.estimate_filter_selectivity("label = 3")  # state miss: re-scan
    assert idx.compact_epochs() > 0
    idx.estimate_filter_selectivity("label = 3")  # version miss: re-scan
    assert len(_SELECTIVITY_CACHE) == n0  # replaced, never accreted


def test_failed_attr_build_leaves_no_version_dir(spark, tmp_path, emb_cents):
    """ADVICE r11 #4: build() validates attrs BEFORE any on-disk
    write, so a duplicate-vec_id failure leaves the index path empty
    (no orphan uncommitted version dir waiting for a later GC)."""
    emb, cents = emb_cents
    attrs = emb.select("vec_id", "label")
    path = tmp_path / "orphan"
    with pytest.raises(ValueError, match="unique"):
        IVFIndex.build(
            spark,
            emb,
            str(path),
            centroids=cents,
            attrs=attrs.unionByName(attrs.limit(3)),
        )
    leftovers = (
        [n for n in os.listdir(path) if n.startswith("v")]
        if path.exists()
        else []
    )
    assert leftovers == []


def test_filtered_rerank_auto_depth_from_sq8(spark, tmp_path, emb_cents):
    """Filtered auto-depth rerank with the SQ8 tier as the refine
    source: the per-cell selectivity estimate runs over the SQ8
    artifact's raw rows (attrs live next to the int8 codes) through
    the same inherited code path, so the depth rule must return the
    full k there too, and the id set must track the fp64-refined
    result within the tier's ~1e-3 score perturbation."""
    emb, cents = emb_cents
    attrs = emb.select("vec_id", "label")
    flat = IVFIndex.build(
        spark, emb, str(tmp_path / "f"), centroids=cents, attrs=attrs
    )
    sq8 = IVFSQ8Index.build(
        spark, emb, str(tmp_path / "s"), centroids=cents, attrs=attrs
    )
    pq = IVFPQIndex.build(spark, emb, str(tmp_path / "p"), centroids=cents)
    q = _queries(emb, 8, 28)
    want = _ids(
        topk_rerank(pq, flat, q, k=5, r=8, nprobe=2, where="label = 3")
    )
    got = _ids(
        topk_rerank(pq, sq8, q, k=5, r=8, nprobe=2, where="label = 3")
    )
    assert len(want) == 100  # 20 queries x full k: auto depth worked
    assert len(got) == 100  # ...through the SQ8 estimate path too
    assert len(want & got) / len(want) >= 0.9


# ----------------------------------------------------- reader leases


def test_pinned_reader_survives_two_mutations(spark, tmp_path, emb_cents):
    """Reader leases (VERDICT r9/r11 carried limit, closed r12): the
    lock-free grace window only survives ONE mutation per read — a
    long reader pinned via `with idx.pinned()` must keep serving its
    version bit-identically through TWO truncating mutations, while
    an unpinned stale handle's version is GC'd as before."""
    emb, cents = emb_cents
    idx = IVFIndex.build(
        spark, emb, str(tmp_path / "lease"), centroids=cents
    )
    q = _queries(emb)
    with idx.pinned() as view:
        before = {
            (r.query_id, r.vec_id, r.cos_sim, r.rank)
            for r in view.topk(q, k=5).collect()
        }
        pinned_dir = view._require_current()
        # two truncating mutations: past the unpinned grace window
        assert idx.delete([400, 401]) > 0
        assert idx.delete([402, 403]) > 0
        assert os.path.isdir(pinned_dir)  # lease held it through GC
        after = {
            (r.query_id, r.vec_id, r.cos_sim, r.rank)
            for r in view.topk(q, k=5).collect()
        }
        assert after == before  # the pinned read is version-frozen
        # mutations through the pinned view must refuse
        with pytest.raises(RuntimeError, match="pinned"):
            view.delete([1])
        with pytest.raises(RuntimeError, match="pinned"):
            view.compact_epochs()
    # lease released: the next mutation sweeps the old version
    assert idx.delete([404]) > 0
    assert not os.path.isdir(pinned_dir)


def test_expired_lease_is_swept(spark, tmp_path, emb_cents):
    """A lease leaked by a crashed reader blocks GC for at most
    LEASE_TTL_SECONDS: backdating the lease file makes the next
    mutation sweep both the lease and its version."""
    import time as _time

    from open_tlm_spark.operators.ivf_store import _LEASE_DIR

    emb, cents = emb_cents
    idx = IVFIndex.build(
        spark, emb, str(tmp_path / "ttl"), centroids=cents
    )
    ctx = idx.pinned()
    view = ctx.__enter__()  # deliberately never exited: a dead reader
    pinned_dir = view._require_current()
    ldir = os.path.join(str(tmp_path / "ttl"), _LEASE_DIR)
    (lease,) = [f for f in os.listdir(ldir) if f.endswith(".lease")]
    old = _time.time() - 2 * 24 * 3600
    os.utime(os.path.join(ldir, lease), (old, old))
    assert idx.delete([400, 401]) > 0
    assert idx.delete([402, 403]) > 0
    assert not os.path.exists(os.path.join(ldir, lease))  # swept
    assert not os.path.isdir(pinned_dir)  # version reclaimed


def test_pinned_reader_stress_back_to_back_mutations(
    spark, tmp_path, emb_cents
):
    """The lease contract under actual concurrency: the UNPINNED
    stress test must space its mutations (the grace window protects
    one mutation per read); a PINNED reader needs no cadence — it
    re-reads its version bit-identically while the writer runs
    intake, compaction, a delete, and a full same-path rebuild
    BACK-TO-BACK. The lease is load-bearing from the second
    mutation on (the pinned version stops being the superseded
    one)."""
    import threading

    emb, cents = emb_cents
    path = str(tmp_path / "pstress")
    idx = IVFIndex.build(
        spark, emb.filter(F.col("vec_id") < 300), path, centroids=cents
    )
    queries = _queries(emb)
    errors: list[str] = []
    stop = threading.Event()
    ready = threading.Event()

    def _pinned_reader():
        try:
            with IVFIndex(spark, path).pinned() as view:
                want = {
                    (r.query_id, r.vec_id, r.cos_sim, r.rank)
                    for r in view.topk(queries, k=3, nprobe=2).collect()
                }
                ready.set()
                while not stop.is_set():
                    got = {
                        (r.query_id, r.vec_id, r.cos_sim, r.rank)
                        for r in view.topk(
                            queries, k=3, nprobe=2
                        ).collect()
                    }
                    if got != want:
                        errors.append("pinned read drifted")
                        return
        except Exception as exc:
            errors.append(f"pinned read failed: {exc}")
            ready.set()

    t = threading.Thread(target=_pinned_reader)
    t.start()
    assert ready.wait(timeout=180)
    try:
        late = emb.filter(
            (F.col("vec_id") >= 300) & (F.col("vec_id") < 400)
        ).select(
            "vec_id", as_double(F.col("embedding")).alias("embedding")
        )
        idx.add(late, epoch=1)
        assert idx.compact_epochs() > 0
        assert idx.delete([350, 351]) > 0
        corpus = idx.assignments().select(
            "vec_id", F.col("nvec").alias("embedding")
        )
        IVFIndex.build(spark, corpus, path, centroids=cents)
    finally:
        stop.set()
        t.join(timeout=180)
    assert not errors, errors


# ------------------------------------------- r13: ADVICE r12 hardening


def test_pinned_selectivity_not_shared_with_live_handle(
    spark, tmp_path, emb_cents
):
    """ADVICE r12 (medium): the selectivity memo keyed its STATE off
    the live pointer + live epoch listing even for a pinned view, so
    counts computed under a pin (which excludes post-pin intake
    epochs) could satisfy the LIVE handle's lookup whenever the two
    states matched textually — auto-depth then sized from the wrong
    corpus. Sequence that used to cross-contaminate: pin, intake
    lands, the PINNED view scans first (caching pin-corpus counts
    under the live state), then the live handle looks up. The live
    estimate must reflect the intake; the pinned estimate must
    not."""
    emb, cents = emb_cents
    attrs = emb.select(
        "vec_id", (F.col("vec_id") % 2).alias("parity")
    )
    idx = IVFIndex.build(
        spark,
        emb.filter(F.col("vec_id") % 2 == 0),  # parity-0 only
        str(tmp_path / "pinsel"),
        centroids=cents,
        attrs=attrs.filter(F.col("vec_id") % 2 == 0),
    )
    with idx.pinned() as view:
        # intake lands AFTER the pin, BEFORE either scan: every new
        # vector fails the predicate, so the live selectivity drops
        odd = emb.filter(F.col("vec_id") % 2 == 1)
        idx.add(
            odd.select(
                "vec_id", as_double(F.col("embedding")).alias("embedding")
            ),
            epoch=1,
            attrs=attrs.filter(F.col("vec_id") % 2 == 1),
        )
        # pinned view scans FIRST (the contamination direction)
        pin_sel = view.estimate_filter_selectivity("parity = 0")
        assert pin_sel == 1.0  # the pinned corpus is all parity-0
        live_sel = idx.estimate_filter_selectivity("parity = 0")
        assert 0.4 < live_sel < 0.6  # sees the intake, not the memo
        # and the pinned view keeps its own answer afterwards
        assert view.estimate_filter_selectivity("parity = 0") == 1.0


def test_pinned_lease_released_on_epoch_capture_error(
    spark, tmp_path, emb_cents
):
    """ADVICE r12: the epoch capture used to run outside pinned()'s
    try/finally — a malformed epoch= leaf raising ValueError leaked
    the lease, pinning the version against GC for the full 24h TTL.
    The failed pin must leave NO live lease behind."""
    from open_tlm_spark.operators.ivf_store import _LEASE_DIR

    emb, cents = emb_cents
    path = str(tmp_path / "leaserr")
    idx = IVFIndex.build(
        spark, emb.filter(F.col("vec_id") < 100), path, centroids=cents
    )
    vdir = idx._require_current()
    bogus = os.path.join(vdir, "assignments", "centroid_id=0", "epoch=bogus")
    os.makedirs(bogus)
    try:
        with pytest.raises(ValueError):
            with idx.pinned():
                pass
    finally:
        os.rmdir(bogus)
    ldir = os.path.join(path, _LEASE_DIR)
    leases = (
        [f for f in os.listdir(ldir) if f.endswith(".lease")]
        if os.path.isdir(ldir)
        else []
    )
    assert leases == []  # released despite the exception


def test_legacy_pinned_view_is_read_only(spark, tmp_path, emb_cents):
    """ADVICE r12: on a legacy (unversioned) artifact _pin stays None,
    so a _pin-based mutability check let add()/compact()/delete()
    through the supposedly read-only view silently succeed. The
    read-only flag is now independent of whether a version existed
    to pin."""
    import shutil as _shutil

    emb, cents = emb_cents
    path = str(tmp_path / "legacyro")
    idx = IVFIndex.build(
        spark, emb.filter(F.col("vec_id") < 100), path, centroids=cents
    )
    vdir = idx._current_dir()
    for sub in ("centroids", "assignments"):
        _shutil.move(os.path.join(vdir, sub), os.path.join(path, sub))
    os.remove(os.path.join(path, "CURRENT"))
    _shutil.rmtree(vdir)

    legacy = IVFIndex(spark, path)
    with legacy.pinned() as view:
        assert view.topk(_queries(emb), k=3).count() > 0  # reads fine
        with pytest.raises(RuntimeError, match="pinned"):
            view.delete([1])
        with pytest.raises(RuntimeError, match="pinned"):
            view.compact_epochs()
        with pytest.raises(RuntimeError, match="pinned"):
            view.add(
                emb.filter(F.col("vec_id") == 200).select(
                    "vec_id",
                    as_double(F.col("embedding")).alias("embedding"),
                ),
                epoch=1,
            )
    # the unpinned handle still mutates
    assert legacy.delete([1]) >= 0


def test_depth_cap_scoped_to_probed_cells(spark, tmp_path, emb_cents):
    """ADVICE r12: the scalar depth bound (and its warnings) derived
    from min selectivity over ALL artifact cells — one matchless cell
    NOBODY probes forced scalar_r=max_r (a 65536-row ADC rank window
    per query) and fired the 'depth capped' warning even when every
    probed cell was rich. The bound now derives from the cells the
    batch actually probes: a starved UNPROBED cell must neither warn
    nor inflate, and the queries must still return full k."""
    import warnings as _warnings

    emb, cents = emb_cents
    pq = IVFPQIndex.build(
        spark, emb, str(tmp_path / "pq"), centroids=cents
    )
    q = _queries(emb)
    probed = {
        int(r.qcell)
        for r in pq._route_queries(q, nprobe=1)
        .select("qcell")
        .distinct()
        .collect()
    }
    unprobed = sorted(set(range(8)) - probed)
    assert unprobed, "need a cell no query probes"
    starved_cell = unprobed[0]
    # attribute correlated with cell geometry: matchless EXACTLY in
    # the one cell no query routes to, 100% everywhere else
    flat0 = IVFIndex.build(
        spark, emb, str(tmp_path / "f0"), centroids=cents
    )
    attrs = flat0.assignments().select(
        "vec_id",
        (F.col("centroid_id") != starved_cell).cast("int").alias("hit"),
    )
    flat = IVFIndex.build(
        spark, emb, str(tmp_path / "f"), centroids=cents, attrs=attrs
    )
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        got = topk_rerank(
            pq, flat, q, k=5, nprobe=1, where="hit = 1", max_r=64
        ).collect()
    cap_warnings = [
        w for w in caught if "capped" in str(w.message)
    ]
    assert cap_warnings == []  # the starved cell is never probed
    assert len(got) == 20  # 4 queries x full k


def test_version_count_bounded_under_pinned_reader(
    spark, tmp_path, emb_cents
):
    """VERDICT r12 'Next round' #6: a healthy reader holding one
    lease across MANY rebuild/compact/delete cycles must not let
    version dirs accrete — the GC keep-set is exactly {current,
    superseded, leased}, so the on-disk version count stays <= 3
    through every mutation, never grows with the cycle count."""
    from open_tlm_spark.operators.ivf_store import _VERSION_RE

    emb, cents = emb_cents
    path = str(tmp_path / "vbound")
    idx = IVFIndex.build(
        spark, emb.filter(F.col("vec_id") < 200), path, centroids=cents
    )
    q = _queries(emb)

    def _versions():
        return [n for n in os.listdir(path) if _VERSION_RE.match(n)]

    with idx.pinned() as view:
        want = {
            (r.query_id, r.vec_id, r.cos_sim, r.rank)
            for r in view.topk(q, k=3).collect()
        }
        pinned_dir = view._require_current()
        for cycle in range(6):
            lo, hi = 200 + cycle * 10, 210 + cycle * 10
            late = emb.filter(
                (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
            ).select(
                "vec_id", as_double(F.col("embedding")).alias("embedding")
            )
            idx.add(late, epoch=1)
            assert idx.compact_epochs() > 0
            assert idx.delete([lo]) > 0
            n = len(_versions())
            assert n <= 3, f"cycle {cycle}: {n} version dirs accreted"
        assert os.path.isdir(pinned_dir)  # the lease held throughout
        got = {
            (r.query_id, r.vec_id, r.cos_sim, r.rank)
            for r in view.topk(q, k=3).collect()
        }
        assert got == want  # and the pinned read never drifted
    # lease released: the next mutation reclaims the pinned version
    assert idx.delete([205]) > 0
    assert len(_versions()) <= 2


def test_build_filtered_serves_full_k_at_defaults(
    spark, tmp_path, emb_cents
):
    """VERDICT r12 'Next round' #4: the depth-cap warning's third
    branch ('serve this predicate from a dedicated index') gets a
    build path. Where the FULL artifact caps at max_r=10 under the
    ~1/64-selective predicate and under-returns, the
    `build_filtered` variant — same centroids, corpus = matching
    rows only — serves the same queries at DEFAULT depth with NO
    predicate, returns the full k, and matches brute force over the
    filtered corpus exactly."""
    import warnings as _warnings

    emb, cents = emb_cents
    attrs = emb.select("vec_id", (F.col("vec_id") % 64).alias("bucket"))
    flat = IVFIndex.build(
        spark, emb, str(tmp_path / "f"), centroids=cents, attrs=attrs
    )
    pq = IVFPQIndex.build(spark, emb, str(tmp_path / "p"), centroids=cents)
    q = _queries(emb)
    # the boundary the variant exists for: capped AND thin
    with pytest.warns(UserWarning, match="capped"):
        thin = topk_rerank(
            pq, flat, q, k=5, nprobe=8, where="bucket = 3", max_r=10
        ).count()
    assert thin < 20
    # dedicated pair: filtered flat (refine) + filtered PQ (candidates),
    # both sharing the source's coarse centroids
    flat_f = flat.build_filtered(str(tmp_path / "ff"), "bucket = 3")
    pq_f = flat.build_filtered(
        str(tmp_path / "pf"), "bucket = 3", cls=IVFPQIndex
    )
    assert flat_f.filter_predicate() == "bucket = 3"
    want = {
        (r.query_id, r.vec_id, r.cos_sim, r.rank)
        for r in brute_force_topk(
            emb.filter(F.col("vec_id") % 64 == 3), q, k=5
        ).collect()
    }
    assert len(want) == 20
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        got = {
            (r.query_id, r.vec_id, r.cos_sim, r.rank)
            for r in topk_rerank(
                pq_f, flat_f, q, k=5, nprobe=8, max_r=10
            ).collect()
        }
    assert got == want  # full k, exact, at the SAME max_r that capped
    assert [w for w in caught if "capped" in str(w.message)] == []
    # attribute columns carry over: the variant still serves further
    # filtering (trivially-true predicate here, but it must RESOLVE)
    assert flat_f.topk(q, k=5, nprobe=8, where="bucket = 3").count() == 20
    # and a full-corpus artifact reports no recorded predicate
    assert flat.filter_predicate() is None


def test_build_filtered_rejects_codes_only_source(
    spark, tmp_path, emb_cents
):
    """A PQ artifact stores codes, not vectors — materializing a
    filtered variant FROM it must fail fast with the pointer to the
    flat/SQ8 source, not die mid-build on a missing column."""
    emb, cents = emb_cents
    pq = IVFPQIndex.build(
        spark, emb, str(tmp_path / "pq"), centroids=cents
    )
    with pytest.raises(TypeError, match="no exact vectors"):
        pq.build_filtered(str(tmp_path / "x"), "vec_id > 0")


def test_build_filtered_refresh_is_atomic_under_reader(
    spark, tmp_path, emb_cents
):
    """A variant goes stale as the source artifact takes intake; the
    refresh path is just build_filtered AGAIN at the same path — the
    stock versioned machinery gives the swap atomicity for free. A
    reader pinned on the old variant must keep its exact rows through
    the refresh; a fresh handle must see the refreshed corpus."""
    emb, cents = emb_cents
    attrs = emb.select("vec_id", (F.col("vec_id") % 2).alias("parity"))
    src = IVFIndex.build(
        spark,
        emb.filter(F.col("vec_id") < 200),
        str(tmp_path / "src"),
        centroids=cents,
        attrs=attrs.filter(F.col("vec_id") < 200),
    )
    vpath = str(tmp_path / "var")
    variant = src.build_filtered(vpath, "parity = 0")
    n0 = variant.assignments().count()
    assert n0 == 100
    q = _queries(emb)
    with variant.pinned() as view:
        before = {
            (r.query_id, r.vec_id, r.cos_sim, r.rank)
            for r in view.topk(q, k=3).collect()
        }
        # source takes intake, then the variant refreshes in place
        late = emb.filter(
            (F.col("vec_id") >= 200) & (F.col("vec_id") < 300)
        )
        src.add(
            late.select(
                "vec_id", as_double(F.col("embedding")).alias("embedding")
            ),
            epoch=1,
            attrs=attrs.filter(
                (F.col("vec_id") >= 200) & (F.col("vec_id") < 300)
            ),
        )
        refreshed = src.build_filtered(vpath, "parity = 0")
        assert refreshed.assignments().count() == 150  # new matches in
        after = {
            (r.query_id, r.vec_id, r.cos_sim, r.rank)
            for r in view.topk(q, k=3).collect()
        }
        assert after == before  # the pinned reader never moved
    assert IVFIndex(spark, vpath).assignments().count() == 150
    assert IVFIndex(spark, vpath).filter_predicate() == "parity = 0"


def test_build_filtered_sq8_tiers(spark, tmp_path, emb_cents):
    """The cls= tier matrix: an SQ8 VARIANT (flat source, quantized
    variant) must serve the filtered corpus with near-flat recall vs
    the exact filtered brute force; an SQ8 SOURCE (dequantizing
    assignments view) must materialize a flat variant whose serve
    matches brute force over the DEQUANTIZED filtered corpus
    exactly."""
    emb, cents = emb_cents
    attrs = emb.select("vec_id", (F.col("vec_id") % 4).alias("quad"))
    flat = IVFIndex.build(
        spark, emb, str(tmp_path / "f"), centroids=cents, attrs=attrs
    )
    q = _queries(emb)
    want = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(
            emb.filter(F.col("vec_id") % 4 == 1), q, k=5
        ).collect()
    }
    # flat -> SQ8 variant: int8 ranking, near-flat overlap
    sq8_var = flat.build_filtered(
        str(tmp_path / "sv"), "quad = 1", cls=IVFSQ8Index
    )
    got = {
        (r.query_id, r.vec_id)
        for r in sq8_var.topk(q, k=5, nprobe=8).collect()
    }
    assert len(got) == 20
    assert len(got & want) / len(want) >= 0.9  # int8 tier tolerance
    # SQ8 -> flat variant: exact over the dequantized corpus
    sq8_src = IVFSQ8Index.build(
        spark, emb, str(tmp_path / "s8"), centroids=cents, attrs=attrs
    )
    flat_var = sq8_src.build_filtered(
        str(tmp_path / "fv"), "quad = 1", cls=IVFIndex
    )
    deq = sq8_src.assignments().filter(F.col("quad") == 1).select(
        "vec_id", F.col("nvec").alias("embedding")
    )
    want_deq = {
        (r.query_id, r.vec_id, r.cos_sim)
        for r in brute_force_topk(deq, q, k=5).collect()
    }
    got_deq = {
        (r.query_id, r.vec_id, r.cos_sim)
        for r in flat_var.topk(q, k=5, nprobe=8).collect()
    }
    assert got_deq == want_deq
