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
# Round-6 head, in priority order:
#   1. Queries whose code CHANGED this round (winnowing short-doc
#      guard + integer fingerprint recovery, ADVICE r5).
#   2. Queries NEW in round 6 (plans/audit_queries.py).
#   3. The r2-era rotation block (last green row in round 2, code
#      unchanged since — enforced by tests/test_evidence_freshness.py
#      + tools/evidence.py fingerprints).
# The r3-era block (including store_roundtrip_rollup,
# metrics_loop_series, asof_align_series, ts_agg_1000s,
# ts_range_scan, ts_rollup_cascade, ts_fidelity_route, which briefly
# held the r6 tail before the round-6b queries displaced them)
# rotates in r7.
_CHECK_FIRST = [
    # 1. changed in round 6 (ADVICE r5 winnowing fixes)
    "dedup_winnowing",
    # 2. new in round 6 (plans/audit_queries.py)
    "source_unigram_kl",
    "tokenizer_fertility_by_source",
    "docs_heaps_law_fit",
    "orders_benford_audit",
    "ts_bollinger_bands",
    "ts_log_returns_vol",
    "ts_cross_corr_lag",
    "retrieval_rrf_fusion",
    "sim_matryoshka_recall_eval",
    "embedding_sq8_error",
    "sample_weighted_hash",
    "dedup_cluster_size_histogram",
    "quality_filter_funnel",
    "sim_ivf_nprobe_sweep",
    # 2b. new in round 6b (plans/mining_queries.py)
    "events_attribution_linear",
    "orders_association_rules",
    "ts_sax_symbols",
    "ts_spectral_entropy",
    "shards_assignment_balance",
    "ts_theil_sen_slope",
    "customers_kanonymity_audit",
    # 3. r2-era rotation block (28 queries, oldest greens first)
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q10_returned_items",
    "tpch_q13_order_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q16_supplier_part_counts",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive_revenue",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_dormant_customers",
    "top_customers_by_revenue",
    "customers_without_orders",
    "parts_above_brand_average",
    "window_user_running_stats",
    "set_ops_purchasers_vs_errors",
    "pivot_event_type_daily",
    "dedup_exact",
    "sessionize_events",
    "multimodal_decode",
    "events_json_props",
    "interval_join_error_windows",
    "ts_derivative",
    "ts_gap_fill",
    "ts_ewma",
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
