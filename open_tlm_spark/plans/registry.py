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
    module: str = ""  # defining module (for evidence freshness)
    func_name: str = ""  # defining function name in that module
    # True: the builder DELIBERATELY runs driver-side actions while
    # being built (iterative convergence loops, store round-trips,
    # self-telemetry harnesses). Exempted — explicitly, by name — from
    # tests/test_plan_quality.py::test_builders_never_call_driver_actions;
    # every other builder must be fully lazy.
    stateful: bool = False


REGISTRY: dict[str, QueryDef] = {}

# The driver's per-round correctness gate checks the first ~50 entries
# of queries() in dict order; tests/test_evidence_freshness.py uses
# this to demand that any query whose definition changed since its
# last green driver row re-enters the checked window.
CHECK_WINDOW = 50


def register(
    name: str,
    oracle: str | None = None,
    bench: bool = True,
    stateful: bool = False,
):
    """Register a query under SURVEY.md §2's inventory name."""

    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            load_tables(spark, sf_dir)
            return fn(spark, sf_dir)

        REGISTRY[name] = QueryDef(
            wrapped, oracle, bench, fn.__module__, fn.__name__, stateful
        )
        return fn

    return deco


# The driver checks ~50 queries per round in dict order, so the head
# of this list chooses what gets an in-round correctness row.
# Round-7 head, in priority order:
#   1. Queries whose code CHANGED this round (CC-subtree sharing via
#      operators/shared_cache.py, VERDICT r6 #3, plus the stateful
#      registry flag added with the fixed laziness test).
#   2. Queries NEW in round 7.
#   3. The r3-era rotation block (last green row in round 3, code
#      unchanged since — enforced by tests/test_evidence_freshness.py
#      + tools/evidence.py fingerprints).
# The r4-era block rotates in r8.
_CHECK_FIRST = [
    # 1. changed in round 7 (shared CC label cache + stateful flag)
    "dedup_clusters",
    "dedup_cluster_size_histogram",
    "quality_filter_funnel",
    # 2. new in round 7
    "decontaminate_minhash_fuzzy",
    "corpus_snapshot_diff",
    "dedup_incremental_minhash",
    "docs_mad_outlier_lengths",
    "customers_fuzzy_linkage",
    "parts_skyline_pareto",
    "orders_cohort_ltv",
    "lineitem_equidepth_histogram",
    "events_top_paths",
    "events_dedup_time_window",
    # 3. r3-era rotation block (37 queries, oldest greens first)
    "store_roundtrip_rollup",
    "metrics_loop_series",
    "ts_range_scan",
    "ts_agg_1000s",
    "ts_rollup_cascade",
    "ts_fidelity_route",
    "ts_dataset_search",
    "ts_value_projection",
    "ts_histogram",
    "ts_minmax_range",
    "ts_topk_latest",
    "asof_align_series",
    "tpch_q2_min_cost_supplier",
    "tpch_q8_market_share",
    "tpch_q9_profit_by_nation_year",
    "tpch_q11_important_stock",
    "tpch_q12_late_shipments",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity_revenue",
    "tpch_q20_excess_suppliers",
    "cube_order_stats",
    "distinct_stats_exact",
    "approx_distinct_stats",
    "percentiles_by_event_type",
    "rank_parts_in_brand",
    "skew_salted_agg",
    "unpivot_part_metrics",
    "pack_sequences",
    "sample_domain_mix",
    "docs_clean_pipeline",
    "text_langid",
    "text_pii_scrub",
    "text_quality_score",
    "text_token_stats",
    "multimodal_frame_sample",
    "multimodal_metadata_stats",
    "multimodal_resize",
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
