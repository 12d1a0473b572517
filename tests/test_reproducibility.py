"""Partition-count invariance: at 1000 executors the shuffle layout is
whatever the cluster decides, so results must not depend on it. The
exact scaled-BIGINT sums and sequential per-series folds exist for this
reason — this test locks the property in by running the same queries
under different spark.sql.shuffle.partitions and requiring
bit-identical frames (not approximately equal)."""

import pytest

from dataframe_retail_e_inventarios_spark.registry import queries
from tests.conftest import SF_SMOKE

INVARIANT_QUERIES = [
    "tpch_pricing_summary",    # associative money sums
    "ols_demand_trend",        # exact BIGINT moments
    "holt_linear_forecast",    # sequential fold per series
    "ewma_weekly_demand",      # scalar fold
    "star_join_revenue",       # exact sums through a join tree
    "revenue_concentration_hhi",
    # r5 continuation: every new query whose result passes through a
    # float aggregate or quantile — the scaled-BIGINT recipes must
    # hold under any shuffle layout.
    "price_elasticity_by_brand",    # DECIMAL co-moment sums
    "rolling_origin_backtest",      # cent sums + scaled MAE terms
    "survival_km_signup_purchase",  # scaled ln(1-d/n) prefix sums
    "psi_order_price_drift",        # scaled PSI terms
    "chi_square_segment_nation",    # scaled cell terms
    "embedding_norm_outliers",      # scaled norms + rounded medians
    # r6 continuation: the eval family's scaled/exact recipes
    "roc_auc_langid",               # DECIMAL U2 rank-sum
    "welch_ttest_price_segments",   # DECIMAL moments -> double closed form
    "spearman_qty_discount",        # integer doubled ranks + DECIMAL moments
    "silhouette_lite_labels",       # per-vector BIGINT snap -> integer mean
    "source_jsd_matrix",            # scaled per-term JSD snaps
    "time_decay_attribution",       # BIGINT decay weights + window normalizer
]


@pytest.fixture()
def restore_shuffle_partitions(spark):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    yield
    spark.conf.set("spark.sql.shuffle.partitions", prev)


@pytest.mark.parametrize("name", INVARIANT_QUERIES)
def test_results_invariant_to_shuffle_partitioning(
    spark, restore_shuffle_partitions, name
):
    fn = queries()[name]
    frames = {}
    for parts in ("3", "17"):
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        df = fn(spark, SF_SMOKE).toPandas()
        cols = sorted(df.columns)
        frames[parts] = df[cols].sort_values(cols, ignore_index=True)
    a, b = frames["3"], frames["17"]
    assert len(a) == len(b) > 0
    assert a.equals(b), f"{name}: results depend on shuffle partition count"
