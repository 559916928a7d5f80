"""Query registry backing __spark_entry__.queries()/oracle_sql().

Each entry pairs a PySpark DataFrame builder with the equivalent
DuckDB SQL (the driver's correctness oracle). Conventions that make
the driver's order-insensitive value-hash comparison deterministic:

  * Every computed column is aliased identically on both sides.
  * Money aggregates go through DECIMAL(18,2|4) casts in BOTH engines
    (exact arithmetic — immune to float summation order), then cast
    back to double for a stable output schema.
  * Ratio/mean outputs are rounded (6 dp) on both sides.
  * Bin timestamps are epoch-second BIGINTs (no tz ambiguity).
  * Top-k queries carry a unique tiebreak column in the ORDER BY.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from open_tlm_spark.session import load_tables


@dataclass(frozen=True)
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None -> rows-only check
    bench: bool = True  # False: correctness-only (e.g. writes state)


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None, bench: bool = True):
    """Register a query under SURVEY.md §2's inventory name."""

    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            load_tables(spark, sf_dir)
            return fn(spark, sf_dir)

        REGISTRY[name] = QueryDef(wrapped, oracle, bench)
        return fn

    return deco


# The driver checks ~50 queries per round in dict order, so with 60+
# registered the head of this list chooses what gets an in-round
# correctness row. Round-3 head: the two r2 hash-FAILs (oracles fixed
# this round), the newly-oracled sketch queries, and the 11 r1-green
# queries that the r2 window rotated out — so the union of r2+r3 rows
# covers every query's current code. Everything is locally verified
# by the (now dtype-strict) tools/diffcheck.py regardless.
_CHECK_FIRST = [
    # new this round — must have an in-round correctness row
    "dedup_clusters",
    "quality_repetition",
    "text_pii_scrub",
    "sample_domain_mix",
    "pack_sequences",
    "decontaminate_ngrams",
    "vocab_doc_freq",
    "multimodal_metadata_stats",
    "docs_clean_pipeline",
    "approx_distinct_stats",
    "distinct_stats_exact",
    "metrics_loop_series",
    "tpch_q8_market_share",
    "tpch_q9_profit_by_nation_year",
    "tpch_q12_late_shipments",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity_revenue",
    "tpch_q20_excess_suppliers",
    "multimodal_resize",
    "multimodal_frame_sample",
    "text_rolling_fingerprint",
    # changed this round (LSH banding rewrite + checkpoints, Arrow
    # block-GEMM scoring) -> must have an in-round row
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "dedup_ngram_jaccard",
    # tokens() rewrite (codegen'd split) flows into these two as well
    "dedup_fingerprint",
    "dedup_simhash",
    "sim_ivf_train",
    "skew_salted_agg",
    "tpch_q2_min_cost_supplier",
    "tpch_q11_important_stock",
    # exercises the store code (counters, warm-path predicate split)
    "store_roundtrip_rollup",
    "asof_align_series",
    "cube_order_stats",
    "percentiles_by_event_type",
    "rank_parts_in_brand",
    "sim_ivf_assign",
    "sim_ivf_topk",
    "text_langid",
    "text_quality_score",
    "text_token_stats",
    "ts_value_projection",
    "unpivot_part_metrics",
]


def _ordered() -> list[str]:
    head = [n for n in _CHECK_FIRST if n in REGISTRY]
    return head + [n for n in REGISTRY if n not in set(head)]


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name].fn for name in _ordered()}


def oracle_queries() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _ordered()
        if REGISTRY[name].oracle is not None
    }
