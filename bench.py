"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line: {"metric", "value" (total sec), "unit", "queries"
(per-query sec), "sf"}.

Timing includes full materialization (collect) — result sets are
bounded (top-k / grouped), so driver transfer is negligible and the
measured cost is the query itself.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from open_tlm_spark.plans import REGISTRY
    from open_tlm_spark.session import get_spark, load_tables

    spark = get_spark("open-tlm-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the session (JVM/codegen) and the OS page cache once so
    # per-query numbers measure the plans, not first-touch overheads.
    tables = load_tables(spark, sf_dir)
    for t in tables:
        spark.table(t).count()

    per_query: dict[str, float] = {}
    t_total = time.perf_counter()
    for name, q in sorted(REGISTRY.items()):
        if not q.bench:
            continue  # correctness-only entries (stateful round trips)
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        n = len(df.collect())
        per_query[name] = round(time.perf_counter() - t0, 4)
        print(f"# {name}: {per_query[name]:.3f}s rows={n}", file=sys.stderr)
    total = round(time.perf_counter() - t_total, 4)

    # The driver records only the LAST ~2000 chars of stdout and
    # json-parses the final line; with 80+ registered queries the full
    # per-query dict overflows that window (round 3 recorded
    # parsed=null). Keep the line under budget: report the slowest
    # queries (the informative ones) inline, count the rest, and write
    # the complete map to BENCH_FULL_LOCAL.json beside this script.
    payload = {
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": dict(per_query),
        "sf": sf,
    }
    full = {**payload, "queries": dict(per_query)}
    by_speed = sorted(per_query, key=per_query.get)  # fastest first
    while len(json.dumps(payload)) > 1800 and by_speed:
        payload["queries"].pop(by_speed.pop(0))
        payload["queries_omitted"] = len(per_query) - len(payload["queries"])
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL_LOCAL.json"),
        "w",
    ) as f:
        json.dump(full, f, indent=1)
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    sys.exit(main())
