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


REGISTRY: dict[str, QueryDef] = {}

# The driver's per-round correctness gate checks the first ~50 entries
# of queries() in dict order; tests/test_evidence_freshness.py uses
# this to demand that any query whose definition changed since its
# last green driver row re-enters the checked window.
CHECK_WINDOW = 50


def register(name: str, oracle: str | None = None, bench: bool = True):
    """Register a query under SURVEY.md §2's inventory name."""

    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            load_tables(spark, sf_dir)
            return fn(spark, sf_dir)

        REGISTRY[name] = QueryDef(
            wrapped, oracle, bench, fn.__module__, fn.__name__
        )
        return fn

    return deco


# The driver checks ~50 queries per round in dict order, so the head
# of this list chooses what gets an in-round correctness row.
# Round-5 head, in priority order:
#   1. The 11 round-3 queries that have NEVER had a driver row in any
#      round (overflowed the r3 and r4 windows; VERDICT r4 item #1) —
#      a green r5 makes the r1–r5 union cover the whole registry.
#   2. Queries whose code CHANGED this round (broadcast-hint removal
#      and lazy corpus-stats rewrites; VERDICT r4 items #2/#3).
#   3. Queries NEW in round 5.
#   4. The r1/r2-era rotation block (code unchanged since last green;
#      enforced by tests/test_evidence_freshness.py). With a 50-slot
#      window the tail of this block overflows to r6 — keep rotating.
_CHECK_FIRST = [
    # 1. never driver-checked (added r3, overflowed r3+r4 windows)
    "ts_cusum_changepoints",
    "cap_per_source",
    "docs_tfidf_topk",  # also changed this round (lazy n_docs, AQE df join)
    "bpe_pair_counts",
    "ts_seasonal_residual",
    "quality_unigram_logprob",
    "ts_downsample_m4",
    "ts_anomaly_zscore",
    "ts_pairwise_corr",
    "stratified_split",
    "event_funnel",
    # 2. changed in round 5: forced-broadcast removal on corpus-sized
    # frames (dedup.py sizes/signature frames, PMI marginals) and
    # lazy 1-row stats frames replacing eager .first()/.count()
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_minhash_est_vs_exact",
    "docs_collocations_pmi",
    "docs_bm25_topk",
    # 2b. flagged stale by tools/evidence.py (seeded from the r1–r4
    # CORRECTNESS files at their boundary commits): these queries'
    # definitions or operator-symbol closures changed during round 4
    # (shared-fingerprint refactor, similarity max_by rewrite,
    # text.py tokenizer adaptation) AFTER their last green row — the
    # comment-based "code unchanged" rotation missed them; the ledger
    # caught it.
    "dedup_simhash",
    "dedup_fingerprint",
    "dedup_embedding_cosine",
    "dedup_clusters",
    "decontaminate_ngrams",
    "text_rolling_fingerprint",
    "quality_repetition",
    "vocab_doc_freq",
    "sim_ivf_assign",
    "sim_ivf_topk",
    "sim_ivf_train",
    "sim_lsh_topk",
    "sim_topk_bruteforce",
    # 3. new in round 5 (plans/selection_queries.py + LM-bucket fix)
    "docs_dsir_importance",
    "docs_ccnet_lm_buckets",
    "mixture_temperature_allocation",
    "embedding_pca_covariance",
    "lsh_scurve_table",
    "ts_ohlc_bars",
    "events_hash_sample",
    "ts_downsample_lttb",
    "ts_percentile_bands",
    "docs_rake_keyphrases",
    "dedup_winnowing",
    "ts_dft_power",
    "dedup_threshold_yield",
    "sim_ivf_balance_audit",
    "quality_bigram_logprob",  # vocab-marginal broadcast hints removed
    "ts_anomaly_mad",  # per-series stats broadcast hints removed
    "ts_seasonality_strength",  # per-series profile broadcast hint removed
    # 4. r1/r2-era rotation block: code unchanged since last green row
    "ts_comment_tag_filter",
    "ts_incremental_merge",
    "ts_histogram_per_series",
    "ts_derivative",
    "ts_gap_fill",
    "ts_ewma",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "top_customers_by_revenue",
    "window_user_running_stats",
    "set_ops_purchasers_vs_errors",
    "pivot_event_type_daily",
    "tpch_q4_order_priority",
    "customers_without_orders",
    "parts_above_brand_average",
    "tpch_q14_promo_revenue",
    "tpch_q18_large_orders",
    "tpch_q10_returned_items",
    "tpch_q7_volume_shipping",
    "tpch_q21_waiting_suppliers",
    "dedup_exact",
    "sessionize_events",
    "multimodal_decode",
    "tpch_q13_order_distribution",
    "tpch_q16_supplier_part_counts",
    "tpch_q19_disjunctive_revenue",
    "tpch_q22_dormant_customers",
    "events_json_props",
    "interval_join_error_windows",
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
