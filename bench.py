"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full materialization with a count() over the
final plan (no toPandas — we measure engine time, not Arrow transfer).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dataframe_retail_e_inventarios_spark.registry import queries
from dataframe_retail_e_inventarios_spark.session import get_spark

HEADLINE = [
    "flagship_inventory",
    "weekly_resample_dense",
    "series_admission_gates",
    "star_join_revenue",
    "topk_parts_per_supplier",
    "backtest_metrics",
    "trailing_moving_average",
    "report_enrich",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "ann_cosine_topk",
    "events_sessionization",
    "text_quality_scores",
    "token_counts",
    "rollup_sales_summary",
    "log_transform_weekly",
    "events_props_json",
    "multimodal_features",
    "embedding_cosine_neardup_bucketed",
    "repetition_stats",
    "pii_redaction",
    "decontamination_overlap",
    "bm25_top_terms",
    "doc_chunks",
    "events_sliding_counts",
    "cdc_latest_state",
    "ewma_weekly_demand",
    "events_view_purchase_join",
    "croston_forecast",
    "seasonality_index",
    "abc_classification",
    "tpch_pricing_summary",
    "ols_demand_trend",
    "holt_linear_forecast",
    "theta_forecast",
    "mann_kendall_trend",
    "gopher_quality_flags",
    "pagerank_event_graph",
    "forecast_model_selection",
    "events_session_window_builtin",
    "trailing_28d_range_frame",
    "decontamination_bloom",
    "demand_autocorrelation",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    qs = queries()
    # Warm the JVM once (codegen compilation, parquet reader init) with
    # a smoke-scale flagship run so measured timings reflect engine
    # work, not first-query warmup.
    qs["flagship_inventory"](spark, "/root/testdata/sf0.001").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        # min of 2 runs: single-shot timings on a shared box swing up
        # to several x with background load/GC; the min is the stable
        # engine-cost estimate (standard benchmarking practice).
        best = None
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
