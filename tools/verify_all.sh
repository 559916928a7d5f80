#!/usr/bin/env bash
# One-command verification: replicates every gate the driver runs.
#   tests    — full pytest suite (includes per-query oracle diff at sf0.001)
#   gate     — tools/diffcheck.py at sf0.01 (the driver's correctness pass),
#              repeated under a non-UTC TZ (driver env may differ)
#   contract — fresh-process __spark_entry__ smoke (plain SparkSession)
#   bench    — bench.py JSON line at sf0.001 (fast smoke; sf0.1 for numbers)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== pytest =="
python -m pytest tests/ -q

echo "== oracle gate (sf0.01, UTC) =="
python tools/diffcheck.py /root/testdata/sf0.01

echo "== oracle gate (sf0.01, TZ=America/New_York) =="
TZ=America/New_York python tools/diffcheck.py /root/testdata/sf0.01

echo "== driver contract =="
python - <<'PY'
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[8]").getOrCreate()
import __spark_entry__ as e
rows = e.entry(spark).collect()
qs, osql = e.queries(), e.oracle_sql()
assert len(rows) > 0 and set(osql) <= set(qs)
print(f"entry rows={len(rows)} queries={len(qs)} oracles={len(osql)}")
PY

echo "== bench smoke (sf0.001) =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 python bench.py 2>/dev/null | tail -1
echo "ALL VERIFICATION PASSED"
