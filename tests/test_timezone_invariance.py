"""Session-timezone invariance: the driver builds its OWN
SparkSession, so date bucketing must give identical results whatever
spark.sql.session.timeZone happens to be. Runs tz-sensitive queries
under UTC and under America/New_York (UTC-5, DST) and requires
bit-identical outputs. Every compared query emits only dates, longs,
strings, or doubles — no TIMESTAMP_LTZ columns whose collected
representation would itself depend on the session zone."""

import pytest

from dataframe_retail_e_inventarios_spark.registry import queries
from tests.conftest import SF_SMOKE

TZ_SENSITIVE = [
    "weekly_resample_sparse",   # W-SUN date bucketing of NTZ timestamps
    "daily_lag_features",       # daily resample + date spine
    "events_hourly_counts",     # epoch-based hour bucketing
    "events_sliding_counts",    # window() generator over NTZ ts
    "ewma_weekly_demand",       # week-sorted per-series fold
    "cdc_latest_state",         # timestamp-literal split + epoch output
    "events_cohort_retention",  # epoch-day cohort arithmetic
    "events_view_purchase_join",  # interval predicate on NTZ timestamps
    "seasonality_index",        # ISO week-of-year extraction
    "holiday_demand_lift",      # month() extraction on week dates
    "rolling_median_demand",    # week-ordered trailing window
    "ols_demand_trend",         # dense-week positions as regressor
    "holt_linear_forecast",     # week-sorted trailing-window fold
    "tpch_pricing_summary",     # timestamp-literal ship-date filter
    "inventory_projection_recursive",  # recursive sim over week positions
    "forecast_model_selection",        # train/holdout split on week order
    "demand_autocorrelation",          # week-ordered lag products
    "eoq_order_quantity",              # calendar-span annualization
    "events_session_window_builtin",   # native session_window on NTZ ts
    "trailing_28d_range_frame",        # epoch-day RANGE frame
    # r5 continuation: new timestamp/date-deriving queries
    "window_funnel_levels",            # microsecond diffs on NTZ chains
    "survival_km_signup_purchase",     # epoch-derived day durations
    "rolling_origin_backtest",         # date casts + fold cutoff arithmetic
    "psi_order_price_drift",           # orderdate midpoint split
    # r6 continuation: new date/epoch-deriving queries
    "conformal_forecast_intervals",    # weekly resample + last-4-week split
    "backtest_mase",                   # weekly resample + naive-1 lags
    "time_decay_attribution",          # epoch-second lead arithmetic
]


@pytest.fixture()
def ny_session(spark):
    prev = spark.conf.get("spark.sql.session.timeZone")
    yield
    spark.conf.set("spark.sql.session.timeZone", prev)


@pytest.mark.parametrize("name", TZ_SENSITIVE)
def test_results_identical_under_hostile_timezone(spark, ny_session, name):
    fn = queries()[name]
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    utc = fn(spark, SF_SMOKE).toPandas()
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    ny = fn(spark, SF_SMOKE).toPandas()

    cols = sorted(utc.columns)
    assert cols == sorted(ny.columns)
    a = utc[cols].sort_values(cols, ignore_index=True)
    b = ny[cols].sort_values(cols, ignore_index=True)
    assert len(a) == len(b) > 0, name
    assert a.equals(b), f"{name}: results differ under America/New_York"
