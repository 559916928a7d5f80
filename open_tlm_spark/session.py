"""SparkSession bootstrap with scale-oriented defaults.

Tuned for correctness parity with the DuckDB oracle (UTC session time
zone, ANSI off to match permissive reference semantics) and for
large-cluster behavior (AQE incl. skew-join handling, partial
aggregation pushdown, Arrow for any pandas exchange).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "open-tlm-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Defaults target local[$SPARK_GRAFT_CPUS] for tests/bench while
    keeping every knob meaningful on a 1000-executor cluster:

    * ``spark.sql.adaptive.enabled`` — runtime re-planning: coalesce
      tiny shuffle partitions, convert sort-merge→broadcast when a
      side turns out small, split skewed partitions.
    * ``spark.sql.shuffle.partitions`` — sized to cores locally; on a
      real cluster AQE coalescing makes the static value forgiving.
    * ``spark.sql.session.timeZone=UTC`` — the reference's
      naive-local-time handling is a documented bug we do NOT
      replicate (SURVEY.md §4); all engine time math is UTC.
    * Arrow enabled — any pandas_udf/mapInPandas path is batched.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # Deep Catalyst/codegen/regex recursion (e.g. streaming
        # micro-batch planning) can blow the default 512k-1m thread
        # stack in a busy local JVM; give threads real headroom.
        .config("spark.driver.extraJavaOptions", "-Xss32m")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "128m")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def _nanos_ts_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark has no nanos
    timestamp type, so these are read as raw longs and converted."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pq.read_schema(path)
    return [
        f.name
        for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    ]


def _normalize_nanos_table(spark: SparkSession, path: str, ns_cols: list[str]) -> str:
    """One-time schema normalization: rewrite a TIMESTAMP(NANOS)
    table as native µs timestamps into a local cache, atomically.

    WHY (the 100 TB reason): reading nanos as longs and wrapping them
    in timestamp_micros(col div 1000) makes every time predicate a
    function of the column — Catalyst cannot push it to the parquet
    reader, so time-range scans lose row-group skipping entirely
    (verified via PushedFilters). Normalizing once at the boundary —
    exactly what a production ingest job does — restores native
    TIMESTAMP columns with full pushdown + min/max statistics.
    The conversion is lossless (integer ns->µs; the data has no
    sub-µs precision).
    """
    from pyspark.sql import functions as F

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_key = os.path.basename(os.path.normpath(os.path.dirname(path)))
    cache = os.path.join(repo_root, ".tlm_cache", sf_key, os.path.basename(path))
    if not os.path.exists(cache):
        df = spark.read.parquet(path)
        for c in ns_cols:
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        tmp = f"{cache}.tmp.{os.getpid()}"
        df.write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, cache)  # atomic publish; loser of a race cleans up
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return cache


_LOADED: dict[tuple[int, str], dict] = {}


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, "object"]:
    """Load the driver's parquet tables and register temp views.

    Returns {name: DataFrame}. Views let every operator also be
    reachable through ``spark.sql`` (SURVEY.md §7 phase 4).

    Tables with TIMESTAMP(NANOS) columns (unreadable natively by
    Spark) are normalized once into .tlm_cache with µs timestamps —
    see _normalize_nanos_table for why this beats an in-plan
    conversion.
    """
    key = (id(spark), os.path.normpath(sf_dir))
    if key in _LOADED:
        return _LOADED[key]  # views already registered on this session
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Engine invariant (SURVEY.md §4): all time math is UTC. The
    # caller's session may default to a local JVM tz, which would
    # shift naive-datetime output vs the DuckDB oracle.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    names = [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]
    out = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        ns_cols = _nanos_ts_columns(path)
        if ns_cols:
            path = _normalize_nanos_table(spark, path, ns_cols)
        df = spark.read.parquet(path)
        df.createOrReplaceTempView(name)
        out[name] = df
    _LOADED[key] = out
    return out
