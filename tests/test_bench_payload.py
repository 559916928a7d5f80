"""The driver keeps only ~2000 chars of stdout, so bench.py caps the
inline JSON line at 1800 bytes and evicts core queries (loudly) when
over. This guard asserts the FIXED BENCH_CORE set serializes under the
cap with margin even at worst-case timing widths, so the like-for-like
driver subset never silently shrinks between rounds (ADVICE r5).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_CORE  # noqa: E402


def test_bench_core_payload_fits_cap_with_margin():
    # Worst case: every core query takes >100 s (8-char float repr)
    # and the totals are similarly wide.
    core = {k: 999.9999 for k in BENCH_CORE}
    payload = {
        "metric": "total_query_wall_seconds",
        "value": 99999.9999,
        "unit": "sec",
        "core_sec": 99999.9999,
        "n_queries": 999,
        "queries": core,
        "sf": 0.1,
    }
    size = len(json.dumps(payload))
    # 100-byte margin below the 1800-byte drop threshold: adding a
    # core query (~30 bytes) trips this test long before it trips the
    # runtime eviction loop.
    assert size <= 1700, (
        f"BENCH_CORE inline payload is {size}B at worst-case widths; "
        "trim BENCH_CORE before it hits bench.py's 1800B eviction cap"
    )


def test_bench_core_names_are_registered():
    from open_tlm_spark.plans import REGISTRY

    missing = [k for k in BENCH_CORE if k not in REGISTRY]
    assert not missing, f"BENCH_CORE names not in registry: {missing}"
