"""Extended operator inventory: as-of alignment, sessionization,
cube/grouping sets, unpivot, exact percentiles, ranked windows,
value projection, embedding near-dup, multimodal decode."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from open_tlm_spark.operators.asof import asof_join
from open_tlm_spark.operators.multimodal import (
    decode_media,
    media_metadata_stats,
    resize_media,
    sample_frames,
    synth_media,
)
from open_tlm_spark.operators import similarity as S
from open_tlm_spark.plans.registry import register


# ---------------------------------------------------------------- as-of
@register(
    "asof_align_series",
    oracle="""
    WITH e AS (SELECT user_id, ts, value FROM events WHERE event_type = 'error'),
         p AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase')
    SELECT e.user_id, e.ts, e.value, p.value AS last_purchase_value
    FROM e ASOF LEFT JOIN p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
)
def asof_align_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 as a relational operator: for every 'error' event, the
    user's most recent 'purchase' value at-or-before it. Union-tag +
    windowed carry-forward: one shuffle on user_id, no range-join
    blow-up (see operators/asof.py)."""
    ev = spark.table("events")
    e = ev.filter(F.col("event_type") == "error").select("user_id", "ts", "value")
    p = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    return asof_join(
        e, p, key="user_id", ts="ts", value="value", right_alias="last_purchase_value"
    )


# --------------------------------------------------------- sessionization
_GAP_S = 1800


@register(
    "sessionize_events",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > {_GAP_S} * 1000000::BIGINT
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, event_id, ts,
             -- CAST: DuckDB sum() OVER yields HUGEINT (int128); Spark yields
             -- BIGINT. The driver hashes dtype-sensitively, so pin BIGINT.
             CAST(sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
      FROM ordered
    )
    SELECT user_id, session_no,
           count(*) AS n_events,
           min(epoch_us(ts)) AS start_us,
           max(epoch_us(ts)) AS end_us
    FROM sess
    GROUP BY user_id, session_no
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4-adjacent batch sessionization: 30-min-gap sessions via
    lag + running sum (one shuffle on user_id; both window functions
    share the same sort). Streaming equivalent is session_window();
    this is the backfill/batch path."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    ev = spark.table("events")
    marked = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                > _GAP_S * 1_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    sess = marked.withColumn("session_no", F.sum("is_start").over(wcum))
    return sess.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(F.unix_micros("ts")).alias("start_us"),
        F.max(F.unix_micros("ts")).alias("end_us"),
    )


# ------------------------------------------------------------ cube/rollup
@register(
    "cube_order_stats",
    oracle="""
    SELECT coalesce(o_orderstatus, '(all)') AS status,
           coalesce(o_orderpriority, '(all)') AS priority,
           count(*) AS n_orders,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.4 'not in reference, free in Spark': CUBE over two
    dimensions. Spark expands grouping sets in ONE pass (no N scans);
    coalesce labels the rollup rows so the output is null-free."""
    o = spark.table("orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("decimal(38,2)")
            .cast("double")
            .alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            "n_orders",
            "total",
        )
    )


# --------------------------------------------------------------- unpivot
@register(
    "unpivot_part_metrics",
    oracle="""
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part
    """,
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 melt as an engine operator (reference upload client,
    examples/upload_data.py:58-115): wide -> long, a narrow no-shuffle
    transformation."""
    return spark.table("part").unpivot(
        ["p_partkey"],
        [
            F.col("p_size").cast("double").alias("p_size"),
            F.col("p_retailprice").alias("p_retailprice"),
        ],
        "metric",
        "value",
    )


# ------------------------------------------------------------ percentiles
@register(
    "percentiles_by_event_type",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.95), 6) AS p95,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events
    GROUP BY event_type
    """,
)
def percentiles_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` == DuckDB
    quantile_cont, both linear interpolation). At 100 TB prefer
    approx_percentile (see approx_distinct_stats) — exact percentile
    buffers each group; fine for bounded-cardinality telemetry."""
    ev = spark.table("events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


# -------------------------------------------------- approx sketches
@register("approx_distinct_stats", oracle=None)  # sketch outputs are
# engine-specific by construction -> driver records rows-only check
def approx_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch surface for 100 TB interactive queries: HLL++ distinct
    counts and approximate percentiles — single-pass, fixed memory,
    mergeable across partitions (this is what replaces exact
    percentile/countDistinct at scale). Output is flat scalars (the
    percentile array is projected to p50/p95/p99) so rows-only
    canonicalizers can hash it."""
    ev = spark.table("events")
    # rsd stays at the 0.05 default: the HLL register file grows as
    # (1/rsd)^2 LONGS PER GROUP PER PARTITION, and at rsd=0.01 the
    # generated agg-buffer class is big enough that Janino compile
    # alone cost ~2 s per fresh plan (measured). 5% error is the
    # right tradeoff for a monitoring surface; callers needing
    # tighter bounds pay for it knowingly.
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.approx_count_distinct("value").alias("approx_values"),
            F.percentile_approx("value", [0.5, 0.95, 0.99], 1000).alias("_pcts"),
        )
        .select(
            "event_type",
            "approx_users",
            "approx_values",
            F.col("_pcts")[0].alias("approx_p50"),
            F.col("_pcts")[1].alias("approx_p95"),
            F.col("_pcts")[2].alias("approx_p99"),
        )
    )


@register(
    "distinct_stats_exact",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(DISTINCT value) AS n_values
    FROM events
    GROUP BY event_type
    """,
)
def distinct_stats_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-gated exact companion to approx_distinct_stats: same
    grouping, same inputs, exact count(DISTINCT). Proves the sketch
    query's plumbing (grouping keys, column reads, per-type rows)
    against DuckDB even though HLL estimates themselves are
    engine-specific; tests/test_operators.py pins the sketch values
    within rsd bounds against this exact path."""
    ev = spark.table("events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("value").alias("n_values"),
    )


# ----------------------------------------------------------- ranked window
@register(
    "rank_parts_in_brand",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice,
           rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_rank,
           row_number() OVER (PARTITION BY p_brand
                              ORDER BY p_retailprice DESC, p_partkey) AS rn
    FROM part
    QUALIFY rn <= 3
    """,
)
def rank_parts_in_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 ranking windows: top-3 parts per brand by price. rank()
    exposes tie semantics; row_number() with a unique tiebreak bounds
    the output deterministically."""
    w_rank = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    w_rn = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), "p_partkey"
    )
    return (
        spark.table("part")
        .select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.rank().over(w_rank).alias("price_rank"),
            F.row_number().over(w_rn).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# ------------------------------------------------------- value projection
@register(
    "ts_value_projection",
    oracle=f"""
    SELECT event_type AS dataset_id,
           epoch_us(ts) AS ts_us,
           'raw' AS kind,
           value AS display_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-29 00:00:00'
    UNION ALL
    SELECT event_type AS dataset_id,
           (epoch_us(ts) // (1000 * 1000000)) * 1000 * 1000000 AS ts_us,
           'agg' AS kind,
           round(sum(value) / count(value), 6) AS display_value
    FROM events
    WHERE ts < TIMESTAMP '2024-01-29 00:00:00'
    GROUP BY 1, 2
    """,
)
def ts_value_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 polymorphic point->value projection (public/axes.js:210-244):
    a unified frame where raw points carry `value` and aggregated
    points carry mean — the `kind` discriminator + one display_value
    column replaces the frontend's per-type accessors. (Pattern: recent
    window at FULL fidelity, older history from a rollup.)"""
    from open_tlm_spark.functions.time import floor_to

    split = F.lit("2024-01-29 00:00:00").cast("timestamp")
    pts = spark.table("events")
    raw = pts.filter(F.col("ts") >= split).select(
        F.col("event_type").alias("dataset_id"),
        F.unix_micros("ts").alias("ts_us"),
        F.lit("raw").alias("kind"),
        F.col("value").alias("display_value"),
    )
    agg = (
        pts.filter(F.col("ts") < split)
        .groupBy(
            F.col("event_type").alias("dataset_id"),
            (floor_to("ts", 1000) * 1_000_000).alias("ts_us"),
        )
        .agg(F.round(F.sum("value") / F.count("value"), 6).alias("display_value"))
        .select("dataset_id", "ts_us", F.lit("agg").alias("kind"), "display_value")
    )
    return raw.unionByName(agg)


# ------------------------------------------------- embedding near-dup
_NORMED_LBL_CTE = """
    WITH vecs AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS vec FROM embeddings
    ),
    normed AS (
      SELECT vec_id, label,
             list_transform(vec, x -> x / n) AS nvec
      FROM (SELECT vec_id, label, vec,
                   sqrt(list_sum(list_transform(range(1, 65), i -> vec[i] * vec[i]))) AS n
            FROM vecs))
"""


@register(
    "dedup_embedding_cosine",
    oracle=f"""{_NORMED_LBL_CTE}
    SELECT vec_a, vec_b, cos_sim FROM (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             round(list_sum(list_transform(range(1, 65), i -> a.nvec[i] * b.nvec[i])), 6) AS cos_sim
      FROM normed a JOIN normed b
        ON a.label = b.label AND a.vec_id < b.vec_id
    ) WHERE cos_sim >= 0.35
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (>= 0.35) with label blocking:
    scoring runs only within blocks (here the cluster label; in
    production an LSH/IVF bucket), turning O(n^2) into O(sum b_i^2)
    — the standard scale pattern for vector dedup. Scoring is one
    Arrow stage per block (block-local matrix product, fold-order
    accumulation — see operators/similarity.blocked_cosine_pairs),
    which ships each vector once instead of once per pair.

    r13 note: deliberately NOT rewired onto the session-shared
    normalized corpus — that frame drops `label`, and rejoining it by
    vec_id would trade this query's single narrow pass (scan ->
    normalize -> one label shuffle) for a corpus-sized equi-join;
    the plan pin (test_embedding_dedup_single_block_shuffle: one
    shuffle, no Join) is the scale property worth keeping."""
    from open_tlm_spark.session import fan_out

    vecs = S.normalized(
        fan_out(spark.table("embeddings")).select(
            "vec_id", "label", S.as_double(F.col("embedding")).alias("vec")
        ),
        "vec",
    ).select("vec_id", "label", "nvec")
    return S.blocked_cosine_pairs(vecs, "label", "vec_id", "nvec", 0.35)


# ----------------------------------------------------------- multimodal
@register(
    "multimodal_decode",
    oracle="""
    WITH media AS (
      SELECT doc_id AS media_id, 'image' AS media_type,
             4 + octet_length(encode(text)) AS n_bytes,
             'IMG1' || text AS payload
      FROM documents
    )
    SELECT media_id, media_type,
           CAST(n_bytes % 640 + 1 AS INTEGER) AS width,
           CAST(n_bytes % 480 + 1 AS INTEGER) AS height,
           1 AS n_frames,
           CAST(list_sum(list_transform(range(1, least(n_bytes, 64) + 1),
                i -> ord(substr(payload, i, 1)))) AS BIGINT) AS feature_norm
    FROM media
    """,
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode plumbing: binary content column ->
    mapInPandas (Arrow-batched) fake decoder -> typed features. The
    decoder body is the stub a real deployment swaps for PIL/ffmpeg;
    schema, batching, and partitioning are the real thing
    (operators/multimodal.py)."""
    media = synth_media(spark.table("documents"), "doc_id", "text")
    out = decode_media(media)
    return out.select(
        "media_id",
        "media_type",
        "width",
        "height",
        F.col("n_frames").cast("int").alias("n_frames"),
        "feature_norm",
    )


@register(
    "multimodal_metadata_stats",
    oracle="""
    WITH media AS (
      SELECT doc_id, 'image' AS media_type, 'fake/v1' AS codec,
             4 + octet_length(encode(text)) AS n_bytes
      FROM documents
    )
    SELECT media_type, codec,
           count(*) AS n_items,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           max(n_bytes) AS max_bytes
    FROM media
    GROUP BY media_type, codec
    """,
)
def multimodal_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only aggregate over the media table: Parquet column
    pruning means the binary payload is never read (ReadSchema
    excludes `content` — asserted in tests)."""
    media = synth_media(spark.table("documents"), "doc_id", "text")
    return media_metadata_stats(media)


@register(
    "multimodal_resize",
    oracle="""
    WITH media AS (
      SELECT doc_id AS media_id,
             4 + octet_length(encode(text)) AS n
      FROM documents
    ),
    dims AS (
      SELECT media_id,
             CAST(n % 640 + 1 AS BIGINT) AS w,
             CAST(n % 480 + 1 AS BIGINT) AS h
      FROM media
    )
    SELECT media_id,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(CASE WHEN w <= 320 AND h <= 240 THEN w
                ELSE greatest(1, w * (CASE WHEN w * 240 >= h * 320 THEN 320 ELSE 240 END)
                               // (CASE WHEN w * 240 >= h * 320 THEN w ELSE h END))
           END AS INTEGER) AS out_w,
           CAST(CASE WHEN w <= 320 AND h <= 240 THEN h
                ELSE greatest(1, h * (CASE WHEN w * 240 >= h * 320 THEN 320 ELSE 240 END)
                               // (CASE WHEN w * 240 >= h * 320 THEN w ELSE h END))
           END AS INTEGER) AS out_h
    FROM dims
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounding-box resize planning (320x240) over the media table —
    Arrow batch stage, rational integer scaling (bit-reproducible;
    see operators/multimodal.resize_media)."""
    media = synth_media(spark.table("documents"), "doc_id", "text")
    return resize_media(media, 320, 240)


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH media AS (
      SELECT doc_id AS media_id, text,
             octet_length(encode(text)) AS body_len
      FROM documents
    )
    SELECT media_id,
           CAST(f AS INTEGER) AS frame_no,
           CAST(list_sum(list_transform(
                  range(CAST(f * 16 + 1 AS BIGINT),
                        CAST(least((f + 1) * 16, body_len) + 1 AS BIGINT)),
                  i -> ord(substr(text, CAST(i AS INTEGER), 1))))
                AS BIGINT) AS frame_feature
    FROM media,
         UNNEST(range(0, CAST((body_len + 15) // 16 AS BIGINT), 4)) AS t(f)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-4th-frame sampling over fake 16-byte frames — the
    row-expanding Arrow stage (media row -> ~n_frames/4 frame rows)
    with a per-frame byte-sum feature; a real demuxer swaps into the
    same batch loop (operators/multimodal.sample_frames)."""
    media = synth_media(spark.table("documents"), "doc_id", "text")
    return sample_frames(media, every_k=4)


# ------------------------------------------- multimodal exact dedup
@register(
    "multimodal_exact_dedup",
    oracle="""
    SELECT md5('IMG1' || text) AS content_hash,
           min(doc_id) AS keeper_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY md5('IMG1' || text)
    """,
)
def multimodal_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup of binary media payloads by content digest — the
    first pass of every multimodal corpus pipeline (identical bytes
    re-crawled under different ids), keyed on md5(content) with the
    lowest media_id as the deterministic keeper. Runs on the
    synthetic media table (operators/multimodal.synth_media — fake
    IMG1 header over utf-8 payloads; a real deployment points the
    same plan at its image bytes). The oracle hashes the VARCHAR
    concatenation — byte-identical to the binary digest because the
    payloads are valid UTF-8.

    Plan: digest is a narrow codegen'd projection over the binary
    column; ONE hash aggregate keyed by digest (map-side combinable —
    the shuffle carries digests and counts, never payloads, which is
    the point at 100 TB of media)."""
    from open_tlm_spark.operators.multimodal import synth_media
    from open_tlm_spark.session import fan_out

    media = synth_media(
        fan_out(spark.table("documents")), "doc_id", "text"
    )
    return media.groupBy(F.md5("content").alias("content_hash")).agg(
        F.min("media_id").alias("keeper_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )
