"""Cross-module consistency contracts for the session-shared views
(ADVICE r13 #1): the shared builders hardcode parameters that must
stay compatible with the constants their consumers rank/filter by —
a silent mismatch (e.g. bumping _IVFR_K past the shared ground
truth's k) would truncate the GT frame and inflate recall with no
error. The builders themselves are NOT edited to import the
constants because every source change to a shared builder stales its
whole consumer family in the evidence ledger (a dozen green window
rows) — this test pins the contract from the outside instead: it
asserts the literal parameters are still present in the builder
source (so editing one forces updating the expected value here) and
that every consumer constant remains compatible.

Also guards bench attribution: every shared_* builder in
plans/shared_subtrees.py must be listed in bench.py's
_SHARED_BUILDERS, or its build cost silently reverts to
first-consumer lazy attribution (VERDICT r13 "What's wrong" #2).
"""

from __future__ import annotations

import ast
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SUBTREES = os.path.join(
    REPO, "open_tlm_spark", "plans", "shared_subtrees.py"
)


def _builder_source(name: str) -> str:
    with open(_SUBTREES, encoding="utf-8") as f:
        tree = ast.parse(f.read())
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name == name:
            return ast.unparse(node)
    raise AssertionError(f"no builder {name} in shared_subtrees.py")


def test_bruteforce_hi_covers_its_consumers():
    src = _builder_source("shared_bruteforce_hi")
    # the literal contract: top-5 for queries 8 <= vec_id < 12
    assert "k=5" in src, src
    assert "8" in src and "12" in src
    from open_tlm_spark.plans.audit_queries import _NPS_K
    from open_tlm_spark.plans.eval_queries import _IVFR_K

    assert _IVFR_K <= 5, "shared_bruteforce_hi k=5 no longer covers _IVFR_K"
    assert _NPS_K <= 5, "shared_bruteforce_hi k=5 no longer covers _NPS_K"


def test_bruteforce_lo_covers_its_consumers():
    src = _builder_source("shared_bruteforce_lo")
    # the literal contract: top-10 for queries vec_id < 5
    assert "k=10" in src, src
    assert "vec_id') < 5" in src or '"vec_id") < 5' in src, src
    from open_tlm_spark.plans.audit_queries import _MRL_K, _MRL_NQ

    assert _MRL_K <= 10, "shared_bruteforce_lo k=10 no longer covers _MRL_K"
    assert _MRL_NQ <= 5, (
        "shared_bruteforce_lo's vec_id < 5 query set no longer covers "
        "_MRL_NQ"
    )


def test_ivf_cells_and_simhash_match_consumer_constants():
    from open_tlm_spark.plans.pipeline_queries import _SIMHASH_BITS
    from open_tlm_spark.plans.retrieval_queries import _IVFPQ_NCELLS
    from open_tlm_spark.plans.selection_queries import _IVF_AUDIT_K

    src = _builder_source("shared_ivf_cells")
    assert "< 8" in src, src  # 8 lowest-vec_id centroids
    assert _IVFPQ_NCELLS == 8
    assert _IVF_AUDIT_K == 8

    src = _builder_source("shared_simhash")
    assert "bits=16" in src, src
    assert _SIMHASH_BITS == 16


def test_every_shared_builder_is_bench_attributed():
    """A shared_* view missing from bench.py's _SHARED_BUILDERS
    degrades to first-consumer lazy-build attribution — legal but it
    silently re-breaks per-query marginal-cost reporting."""
    import bench

    with open(_SUBTREES, encoding="utf-8") as f:
        tree = ast.parse(f.read())
    builders = {
        node.name
        for node in tree.body
        if isinstance(node, ast.FunctionDef)
        and node.name.startswith("shared_")
    }
    missing = sorted(builders - set(bench._SHARED_BUILDERS))
    assert not missing, (
        f"shared views without a bench shared_build_* line: {missing}"
    )


def test_load_tables_rebinds_views_after_sf_switch(spark):
    """r14 root-cause fix: the (session, sf_dir) memo alone let a
    later load_tables(A) short-circuit after the session had visited
    A then B, leaving every temp view bound to B — queries (and
    shared-view BUILDS, which then poison their sf-keyed cache) ran
    against the wrong scale factor. The memo now also tracks which
    sf the views currently point at and re-registers on a switch."""
    import pyarrow.parquet as pq

    from open_tlm_spark.session import load_tables

    load_tables(spark, "/root/testdata/sf0.001")
    load_tables(spark, "/root/testdata/sf0.01")
    load_tables(spark, "/root/testdata/sf0.001")  # memo hit pre-fix
    n = spark.table("documents").count()
    expected = pq.ParquetFile(
        "/root/testdata/sf0.001/documents.parquet"
    ).metadata.num_rows
    assert n == expected, "views still bound to the previous sf_dir"
