"""The attribution example's equivalence claim, pinned: replaying
the events table through the STREAMING interval join and deriving
credits from the landed pairs must reproduce the registered batch
query's channel table EXACTLY (same pairs, same floor-half-up
credit math, same DECIMAL sums)."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "examples"))

SF = "/root/testdata/sf0.001"


def test_attribution_example_live_equals_batch(spark, tmp_path):
    import attribution_pipeline as ap

    from open_tlm_spark.plans.mining_queries import (
        events_attribution_linear,
    )

    pairs_path = ap.replay(spark, SF, str(tmp_path), n_files=3)
    live = {
        r.channel: (r.n_purchases, r.n_credits, r.attributed_value)
        for r in ap.derive_credits(spark, SF, pairs_path).collect()
    }
    batch = {
        r.channel: (r.n_purchases, r.n_credits, r.attributed_value)
        for r in events_attribution_linear(spark, SF).collect()
    }
    assert live == batch
    assert set(live) <= {"view", "click", "direct"} and live
