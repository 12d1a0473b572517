"""Query registry: every implemented operator exposed as a named query.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with
a DuckDB oracle SQL string (or None for genuinely non-SQL-expressible
ops, which the driver checks rows-only). ``__spark_entry__.py`` is a
thin adapter over this module.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: str | None) -> None:
    if name in _QUERIES:
        raise ValueError(f"duplicate query name: {name}")
    _QUERIES[name] = fn
    if oracle is not None:
        _ORACLES[name] = oracle


# The correctness driver samples the FIRST 50 registry entries
# (verified round 2: CORRECTNESS_r02's keys == the first 50 names in
# registration order). Iteration order is therefore a verification
# budget, and this list spends it deterministically. Everything NOT
# listed still follows, in registration order, and tools/matrix.py
# sweeps the full registry every round regardless (MATRIX_r{N}.json).
_PRIORITY = [
    # r12 rotation (r11 verdict #1): the driver's 50-row budget goes to
    # the STALEST certificates, measured by tools/cert_age.py over
    # artifacts/r*/CORRECTNESS* + the current round's file (vintage
    # table at r12-open: r5=21, r6=46, r7=49, r8=50, r9=1, r10=48,
    # r11=50; never-sampled=0). Budget = the full r5 vintage (21) +
    # the r6 vintage alphabetically (29); the r6 remainder rides along
    # for the r13 rotation. tools/matrix.py still sweeps all 265 every
    # round regardless.
    # r5-vintage (last driver certificate: round 5), alphabetical:
    "gopher_quality_flags",
    "join_cardinality_probe",
    "k_anonymity_audit",
    "mixture_temperature_weights",
    "position_based_attribution",
    "price_elasticity_by_brand",
    "psi_order_price_drift",
    "quality_weighted_sample",
    "revenue_concentration_hhi",
    "rolling_origin_backtest",
    "series_admission_gates",
    "service_level_coverage",
    "streaming_static_enrichment",
    "supplier_lead_times",
    "survival_km_signup_purchase",
    "target_encoding_brand",
    "tokenizer_oov_rate",
    "triangle_count_copurchase",
    "weekly_resample_sparse",
    "window_funnel_levels",
    "woe_information_value",
    # r6-vintage (last driver certificate: round 6), alphabetical:
    "ann_gemm_topk",
    "ann_lsh_bucketed_topk",
    "apriori_triple_itemsets",
    "backtest_mase",
    "bitemporal_snapshot_revenue",
    "bootstrap_ci_weekly_demand",
    "calibration_bins_brier",
    "char_entropy_scores",
    "class_balanced_cap",
    "conformal_forecast_intervals",
    "copurchase_node_jaccard",
    "cross_source_ngram_leakage",
    "cusum_change_points",
    "dataset_stats_manifest",
    "dedup_jaccard_threshold_sweep",
    "doc_vector_hashing",
    "event_path_trigrams",
    "fk_containment_discovery",
    "forecast_reconciliation_topdown",
    "fuzzy_part_name_pairs",
    "gini_revenue_by_nation",
    "hard_negative_mining",
    "kmeans_lite_clusters",
    "ks_price_segments",
    "length_bucketed_padding",
    "ngram_novelty_rate",
    "ols_two_factor_demand",
    "perplexity_bucket_mix",
    "phrase_search_positional",
    # r6 remainder (positions 51+; ride along for r13):
    "reciprocal_rank_fusion",
    "rfm_segmentation",
    "roc_auc_langid",
    "rolling_median_demand",
    "rollup_backfill_empty_restatement",
    "semantic_dedup_signature",
    "silhouette_lite_labels",
    "sparse_cosine_topk",
    "spearman_qty_discount",
    "sql_pipe_pricing_summary",
    "streaming_late_data_watermark",
    "time_decay_attribution",
    "token_cooccurrence_pmi",
    "tokenizer_fertility",
    "video_frame_schedule",
    "vocab_coverage_curve",
    "welch_ttest_price_segments",
]


def _ordered(mapping: dict) -> dict:
    first = {n: mapping[n] for n in _PRIORITY if n in mapping}
    rest = {n: v for n, v in mapping.items() if n not in first}
    return {**first, **rest}


def queries() -> dict[str, QueryFn]:
    _load_all()
    return _ordered(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return _ordered(_ORACLES)


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from .plans import queries_core  # noqa: F401

    for mod in (
        "queries_relational",
        "queries_stats",
        "queries_report",
        "queries_llm",
        "queries_forecast",
        "queries_streaming",
        "queries_extra",
        "queries_curation",
        "queries_datacleaning",
        "queries_sql",
        "queries_scale",
        "queries_trend",
        "queries_modern",
        "queries_layout",
        "queries_warehouse",
        "queries_corpus",
        "queries_dq",
        "queries_eval",
        "queries_mining",
    ):
        qualname = f"{__package__}.plans.{mod}"
        try:
            __import__(qualname, fromlist=["*"])
        except ModuleNotFoundError as e:
            # Only "this module isn't built yet" is ignorable; a missing
            # dependency INSIDE an existing module must fail loudly or
            # the verified query surface silently shrinks.
            if e.name != qualname:
                raise
    _LOADED = True
