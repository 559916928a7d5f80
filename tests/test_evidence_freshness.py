"""Evidence-freshness guard (VERDICT r4 "Next round" #4).

The registry's rotation policy used to be a comment ("code unchanged
since its last green row"); these tests make it machine-checked. The
ledger `open_tlm_spark/plans/evidence.json` records, per query, the
round of its last green driver CORRECTNESS row plus fingerprints of
everything behavior-relevant (its own decorated source + referenced
module constants, the used-symbol closure in operator modules, and
the oracle SQL). Any drift since that row must push the query back
into the driver's next ~50-query correctness window.

Maintenance loop: after a driver round lands CORRECTNESS_r{N}.json,
run `python tools/evidence.py update --round N CORRECTNESS_r{N}.json`
and reshape `_CHECK_FIRST` for the next round.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.evidence import LEDGER, stale_queries  # noqa: E402


def _window() -> list[str]:
    from open_tlm_spark.plans.registry import CHECK_WINDOW, spark_queries

    return list(spark_queries())[:CHECK_WINDOW]


def test_ledger_exists_and_covers_registry():
    from open_tlm_spark.plans import REGISTRY

    assert os.path.exists(LEDGER), "run: python tools/evidence.py seed"
    with open(LEDGER, encoding="utf-8") as f:
        ledger = json.load(f)
    # ledger never references queries that no longer exist
    unknown = set(ledger) - set(REGISTRY)
    assert not unknown, f"stale ledger entries: {sorted(unknown)}"
    # every registered query either has a ledger row or is queued in
    # the check window (i.e. brand-new this round)
    window = set(_window())
    missing = [
        n for n in REGISTRY if n not in ledger and n not in window
    ]
    assert not missing, (
        "queries with no evidence row and not queued for the next "
        f"driver window: {missing}"
    )


def test_every_stale_query_is_in_the_check_window():
    """Definition/dep/oracle drift since the last green driver row
    forces the query into the next checked window — the rotation
    policy, enforced."""
    window = set(_window())
    uncovered = {
        name: reason
        for name, reason in stale_queries().items()
        if name not in window
    }
    assert not uncovered, (
        "queries changed since their last green driver row but NOT "
        "queued in the next correctness window — move them to the "
        f"front of _CHECK_FIRST: {uncovered}"
    )


def test_fresh_queries_do_not_crowd_out_stale_ones():
    """If more queries are stale than the window holds, every slot
    must go to a stale query (fresh rotation re-checks are luxury,
    not priority)."""
    window = _window()
    stale = set(stale_queries())
    if len(stale) >= len(window):
        fresh_in_window = [n for n in window if n not in stale]
        assert not fresh_in_window, (
            "window oversubscribed by stale queries yet holds fresh "
            f"ones: {fresh_in_window}"
        )


def test_closure_follows_query_builder_composition():
    """VERDICT r13 #1: `sim_pq_recall_eval` composes another module's
    query builder (`sim_pq_adc_topk`); in round 13 that builder was
    rewired without the composing query's own source changing, and
    the ledger missed it. The round-14 closure extension must catch a
    SEEDED composition-only change: editing the body of a composed
    plans-module builder has to flip the composing query's deps."""
    from tools.evidence import _read_fs, compute_record
    from open_tlm_spark.plans import REGISTRY

    q = REGISTRY["sim_pq_recall_eval"]
    base = compute_record(q.module, q.func_name, q.oracle, _read_fs)
    # the composed builder's module must be part of the closure at all
    assert any("plans/" in p for p in base["deps"]), base["deps"]

    target = "open_tlm_spark/plans/vector_queries.py"
    assert target in base["deps"], sorted(base["deps"])

    def read_mutated(path: str) -> str | None:
        src = _read_fs(path)
        if src is not None and path == target:
            # semantically inert but source-visible edit INSIDE the
            # composed builder's body (not the composing query's)
            src = src.replace(
                '(F.col("ik") % 100).alias("code")',
                '(F.col("ik") % (100)).alias("code")',
                1,
            )
        return src

    mutated = compute_record(q.module, q.func_name, q.oracle, read_mutated)
    assert mutated["fingerprint"] == base["fingerprint"], (
        "the probe must not touch the composing query's own source"
    )
    assert mutated["deps"] != base["deps"], (
        "composition-only change was NOT caught by the dep closure"
    )


def test_update_mode_records_green_rows(tmp_path):
    """`evidence.py update` on a real driver correctness file must
    produce fresh records (current fingerprints + oracle hash) for
    every green query and leave red/unknown queries untouched."""
    import json

    from tools.evidence import cmd_update, compute_record, _read_fs
    from open_tlm_spark.plans import REGISTRY

    ledger_path = tmp_path / "ledger.json"
    corr = os.path.join(REPO, "CORRECTNESS_r04.json")
    assert cmd_update(4, corr, str(ledger_path)) == 0
    with open(ledger_path) as f:
        ledger = json.load(f)
    with open(corr) as f:
        rows = json.load(f)
    green = {
        n
        for n, r in rows.items()
        if n in REGISTRY and r.get("err") is None and r.get("hash_match")
    }
    assert green <= set(ledger)
    # records carry CURRENT fingerprints and a real oracle hash
    some = sorted(green)[0]
    q = REGISTRY[some]
    cur = compute_record(q.module, q.func_name, q.oracle, _read_fs)
    assert ledger[some]["fingerprint"] == cur["fingerprint"]
    assert ledger[some]["round"] == 4
    assert ledger[some]["oracle_sha"] == cur["oracle_sha"]
