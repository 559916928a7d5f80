"""Migrate a reference (bwoodbury3/open-tlm) on-disk store into this
engine's TelemetryStore — the switching path for an existing
deployment: point this at the reference's data directory and get a
parquet store serving the same series through every operator here.

Reads ONLY the reference's FULL-fidelity tree
(``<base>/full/<dataset_id>/<a>/<b>/<c>/<trunc>`` files of
``epoch_seconds,value`` CSV lines — layout per
/root/reference/src/index.py:460-520); every rollup level is REBUILT
by this engine's ingest cascade rather than copied, so the migrated
store's aggregates carry this engine's exact-merge guarantees (and
the reference's double-counted duplicate quirk, src/index.py:39-40,
is corrected by put()'s dedup rather than preserved).

Spark-first: the whole tree is ONE distributed CSV scan
(recursiveFileLookup) with the dataset id recovered from the file
path — no per-file driver loop, so a store with millions of shard
files migrates at cluster parallelism.

Usage: python tools/migrate_reference_store.py REF_BASE OUT_BASE
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from open_tlm_spark.store import TelemetryStore


def migrate(
    spark: SparkSession,
    ref_base: str,
    out_base: str,
    n_buckets: int = 8,
) -> TelemetryStore:
    """Read the reference store's raw tree and ingest it. Returns
    the populated TelemetryStore (raw + all 6 rollup levels)."""
    # the reference Index roots its trees under <base>/data/
    # (src/index.py Index.__init__); accept base, base/data, or a
    # direct path to the full/ tree's parent
    candidates = [
        os.path.join(ref_base, "data", "full"),
        os.path.join(ref_base, "full"),
    ]
    full = next((c for c in candidates if os.path.isdir(c)), None)
    if full is None:
        raise FileNotFoundError(
            f"{ref_base}: not a reference store (no data/full fidelity tree)"
        )
    store = TelemetryStore(spark, out_base, n_buckets=n_buckets)
    raw = (
        spark.read.schema("ts double, value double")
        .option("recursiveFileLookup", "true")
        .csv(full)
    )
    # anchor the extract to THIS full/ tree: a stray directory named
    # "full" higher up the absolute path (e.g. /srv/full/ref/data/
    # full/<ds>/...) must not capture the wrong segment (ADVICE r6)
    full_abs = os.path.abspath(full)
    ds_pattern = re.escape(full_abs) + r"/([^/]+)/"
    pts = raw.select(
        F.regexp_extract(
            F.input_file_name(), ds_pattern, 1
        ).alias("dataset_id"),
        # reference timestamps are epoch SECONDS as python float
        # repr — ROUND to micros (ADVICE r6: a bare long cast
        # truncates the ~1% of fractional-second values whose
        # double product lands just below the integer, producing
        # 1 µs-offset duplicates on re-post after migration)
        F.timestamp_micros(
            F.round(F.col("ts") * F.lit(1_000_000.0), 0).cast("long")
        ).alias("ts"),
        "value",
    )
    store.put(pts)
    return store


def main() -> int:
    from open_tlm_spark.session import get_spark

    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    ref_base, out_base = sys.argv[1], sys.argv[2]
    spark = get_spark("migrate-reference-store")
    spark.sparkContext.setLogLevel("ERROR")
    store = migrate(spark, ref_base, out_base)
    n = spark.read.parquet(store.points_path).count()
    names = [r.dataset_id for r in store.datasets().collect()]
    print(f"migrated {n} points across {len(names)} datasets -> {out_base}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
