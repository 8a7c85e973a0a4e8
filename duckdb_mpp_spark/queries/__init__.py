"""Query registry — the verified query surface of the engine.

Every entry is one operator/capability from SURVEY §2 (or a north-star
pipeline operator), expressed Spark-first, with an equivalent DuckDB oracle
SQL for differential correctness (the reference's own capability *is*
DuckDB, so DuckDB-as-oracle is exactly "matches the reference's results").

Determinism conventions (cross-engine float safety):
- Aggregated doubles go through exact DECIMAL sums:
  ``CAST(SUM(CAST(expr AS DECIMAL(18,6))) AS DOUBLE)`` — decimal addition is
  associative, so Spark's parallel partial aggregation and DuckDB's
  sequential sum produce bit-identical results; the final double conversion
  is exact for values < 2^53.
- Averages are written as exact-sum / count.
- LIMIT queries carry a unique tiebreak column in ORDER BY.
- Timestamps compare against full literals; the Spark session runs UTC.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from duckdb_mpp_spark.session import tune_session
from duckdb_mpp_spark.sources import register_views


@dataclass
class Query:
    """One verified query.

    ``spark``: shared-dialect SQL text (run via ``spark.sql`` → Catalyst) or
    a callable ``(spark, sf_dir) -> DataFrame`` for DataFrame-API operators.
    ``oracle``: DuckDB SQL; defaults to ``spark`` when that is shared text.
    ``None`` → non-SQL-expressible; driver falls back to rows-only check.
    """

    spark: str | Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None

    def oracle_sql(self) -> str | None:
        if self.oracle is not None:
            return self.oracle
        return self.spark if isinstance(self.spark, str) else None


REGISTRY: dict[str, Query] = {}


def register(name: str, query: Query) -> None:
    assert name not in REGISTRY, f"duplicate query {name}"
    REGISTRY[name] = query


_LOADED = False


def _ensure_loaded() -> None:
    """Populate the registry on first use rather than at import time, so
    operator modules can be imported directly (in any order) without
    re-entering their own partially-initialized modules through the
    registration chain."""
    global _LOADED
    if _LOADED:
        return
    _LOADED = True
    from duckdb_mpp_spark.queries import core  # noqa: F401
    from duckdb_mpp_spark.queries import windows_sets  # noqa: F401
    from duckdb_mpp_spark.queries import events  # noqa: F401
    from duckdb_mpp_spark.queries import mpp_layer  # noqa: F401
    from duckdb_mpp_spark.queries import pipeline  # noqa: F401
    from duckdb_mpp_spark.queries import streaming_queries  # noqa: F401
    from duckdb_mpp_spark.queries import surface_extra  # noqa: F401


# Driver-verification bookkeeping.  The driver checks the first ~50 entries
# of queries() per round, so ordering IS the verification schedule:
#   tier 0 — never driver-GREEN (new queries + the two reformulated
#            ex-no_oracle gates: they need their first green row)
#   tier 1 — verified in round 1 only (stalest green rows → re-verify first)
#   tier 2 — verified in round 2, not since
#   tier 3 — verified in round 3 (freshest; re-verified only if budget allows)
# Rotation: each round, fold the new CORRECTNESS_r{N} names into the
# freshest tier and demote the previous round's set one tier.
_R1_VERIFIED: frozenset[str] = frozenset(
    {
        "filter_pushdown_scan", "q01_pricing_summary", "q03_shipping_priority",
        "q04_order_priority", "q05_local_supplier_volume", "q06_forecast_revenue",
        "q07_volume_shipping", "q09_product_profit", "q10_returned_items",
        "q12_priority_shipping", "q13_customer_distribution", "q14_promo_effect",
        "q15_top_supplier", "q16_parts_suppliers", "q17_small_quantity_revenue",
        "q18_large_volume_customer", "q19_discounted_revenue",
        "q22_global_sales_opportunity", "scalar_function_gauntlet",
        "date_function_surface", "in_subquery", "scalar_subquery_threshold",
        "join_semi_anti", "join_full_outer", "join_cross_theta",
        "q02_min_cost_supplier", "q08_market_share", "q11_important_stock",
        "q20_potential_promotion", "q21_suppliers_kept_waiting",
        "string_regex_surface", "array_struct_surface",
        "recursive_cte_month_spine", "lateral_topk_per_region", "null_semantics",
        "agg_rollup_grouping_fn", "window_topk_per_group", "window_running_total",
        "window_lag_rank", "agg_cube", "agg_rollup", "agg_grouping_sets",
        "agg_multi_distinct", "setop_intersect", "setop_except", "setop_union",
        "setop_union_distinct", "pivot_linestatus", "unpivot_part_measures",
        "window_frame_surface",
    }
)


# The 50 queries CORRECTNESS_r02.json recorded (mirror of that file's keys).
_R2_VERIFIED: frozenset[str] = frozenset(
    {
        "agg_variance_corr", "agg_exact_median", "setop_except_all",
        "setop_intersect_all", "events_hourly_agg", "events_sessionization",
        "events_funnel", "events_json_props", "asof_join_events_orders",
        "range_join_binned", "events_zscore_outliers", "events_cohort_retention",
        "mpp_create_insert_scan", "mpp_update_cow", "mpp_delete_cow",
        "text_token_stats", "text_quality_score", "text_language_id",
        "text_fingerprint", "dedup_exact", "dedup_minhash_signatures",
        "dedup_minhash_lsh_pairs", "dedup_ngram_jaccard", "dedup_simhash",
        "dedup_simhash_pairs", "dedup_cluster_assign", "pipeline_corpus_curation",
        "pipeline_train_test_split", "multimodal_binary_features",
        "multimodal_frame_sample", "ann_topk_bruteforce", "ann_ivf_by_label",
        "ann_lsh_bucketed", "embedding_neardup_pairs", "ann_ivf_kmeans",
        "agg_percentiles_exact", "text_top_tokens", "curation_blocklist_filter",
        "higher_order_array_fns", "dedup_keep_latest", "agg_group_by_all",
        "limit_offset_pagination", "events_value_histogram",
        "sketch_approx_stats", "events_resample_ffill", "events_user_features",
        "mpp_colocated_join", "mpp_rowid_scan", "mpp_sorted_scan",
        "mpp_compact_scan",
    }
)


# The 50 queries CORRECTNESS_r03.json recorded (mirror of that file's keys).
_R3_VERIFIED: frozenset[str] = frozenset(
    {
        "mpp_upsert_scan", "mpp_time_travel", "mpp_copy_roundtrip",
        "mpp_summarize", "mpp_qualify_frontdoor", "mpp_distinct_on_frontdoor",
        "mpp_ddl_frontdoor", "mpp_txn_rollback", "dedup_incremental",
        "dedup_cluster_keep_best", "text_repetition_stats",
        "text_contamination_overlap", "text_pii_redaction",
        "pipeline_sequence_packing", "sampling_weighted_domains",
        "sampling_stratified_exact", "pipeline_global_shuffle",
        "graph_triangle_count", "multimodal_decode_sgm", "ann_quantized_topk",
        "embedding_class_centroids", "ann_centroid_assign",
        "dedup_substring_spans", "text_tfidf_keywords",
        "pipeline_train_test_split", "curation_blocklist_filter",
        "higher_order_array_fns", "streaming_hourly_agg",
        "streaming_session_windows", "streaming_dedup_distinct",
        "streaming_static_join_agg", "streaming_stateful_running_totals",
        "streaming_stream_stream_join", "streaming_mpp_upsert",
        "streaming_mpp_ingest", "filter_pushdown_scan", "q01_pricing_summary",
        "q03_shipping_priority", "q04_order_priority",
        "q05_local_supplier_volume", "q06_forecast_revenue",
        "q07_volume_shipping", "q09_product_profit", "q10_returned_items",
        "q12_priority_shipping", "q13_customer_distribution",
        "q14_promo_effect", "q15_top_supplier", "q16_parts_suppliers",
        "q17_small_quantity_revenue",
    }
)


# Reformulated this round from no_oracle to exact invariant rows
# (VERDICT r3 "Next round" #2) — they have never had a green driver row,
# so they verify ahead of everything already green.
_NEVER_GREEN: frozenset[str] = frozenset(
    {"ann_ivf_kmeans", "sketch_approx_stats"}
)


def _registry_names_prioritized() -> list[str]:
    """Registry names in driver-check priority order (see tier comment
    above): never-green first (new queries + the reformulated ex-no_oracle
    gates), then the stalest verified slice (r1-only — the core SQL
    surface), then r2-only, then the freshest (r3)."""

    def prio(n: str) -> int:
        if n in _NEVER_GREEN:
            return 0
        if n in _R3_VERIFIED:
            return 3
        if n in _R2_VERIFIED:
            return 2
        if n in _R1_VERIFIED:
            return 1
        return 0  # never driver-checked (incl. queries new this round)

    return sorted(REGISTRY, key=prio)  # stable: registry order within tiers


def run_spark_query(name: str, spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_loaded()
    q = REGISTRY[name]
    tune_session(spark)
    register_views(spark, sf_dir)
    if isinstance(q.spark, str):
        return spark.sql(q.spark)
    return q.spark(spark, sf_dir)


def spark_callables() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()

    def make(name):
        return lambda spark, sf_dir: run_spark_query(name, spark, sf_dir)

    return {name: make(name) for name in _registry_names_prioritized()}


def oracle_sqls() -> dict[str, str]:
    _ensure_loaded()
    out = {}
    for name in _registry_names_prioritized():
        sql = REGISTRY[name].oracle_sql()
        if sql is not None:
            out[name] = sql
    return out


