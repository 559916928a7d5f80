"""Smoke + invariants for the end-to-end curation example."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "examples"))

SF = "/root/testdata/sf0.001"


def test_curate_pipeline_invariants(spark):
    import curate_corpus

    clean, packs = curate_corpus.curate(spark, SF)
    docs = spark.table("documents")
    kept = clean.collect()
    assert 0 < len(kept) <= docs.count()
    # kept ids are real documents, unique after dedup
    ids = [r.doc_id for r in kept]
    assert len(ids) == len(set(ids))
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert set(ids) <= all_ids
    pk = packs.collect()
    assert pk
    for p in pk:
        assert p.n_docs >= 1 and p.pack_tokens >= 1
    # every pack key is unique (source, pack_id)
    keys = [(p.source, p.pack_id) for p in pk]
    assert len(keys) == len(set(keys))
