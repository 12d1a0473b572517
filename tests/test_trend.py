"""Trend/regression/graph family (plans/queries_trend.py): Holt fold
exactness vs a Python reference, OLS recovery of a known slope,
PageRank invariants, Gopher rule behavior on crafted documents, and
plan shape of the pricing summary."""

import datetime

import pyspark.sql.functions as F
import pytest

from dataframe_retail_e_inventarios_spark.plans.queries_trend import (
    HOLT_ALPHA,
    HOLT_BETA,
    q_gopher_quality,
    q_holt_linear_forecast,
    q_ols_demand_trend,
    q_pagerank_events,
    q_pricing_summary,
)
from tests.conftest import SF_SMOKE


def _write_lineitem(spark, path, rows):
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp_ntz",
    ).write.mode("overwrite").parquet(f"{path}/lineitem.parquet")


def test_holt_fold_bit_identical_to_python_loop(spark):
    xs = [10.0, 12.0, 14.0, 13.0, 9.0, 11.0, 15.0, 8.0]
    a, b = HOLT_ALPHA, HOLT_BETA
    l, t = xs[0], 0.0
    for x in xs[1:]:
        ln = a * x + (1 - a) * (l + t)
        t = b * (ln - l) + (1 - b) * t
        l = ln
    df = spark.createDataFrame([(xs,)], "xs array<double>")
    pairs = F.transform(
        F.col("xs"), lambda x: F.struct(x.alias("l"), F.lit(0.0).alias("b"))
    )

    def step(acc, p):
        l_new = a * p["l"] + (1 - a) * (acc["l"] + acc["b"])
        b_new = b * (l_new - acc["l"]) + (1 - b) * acc["b"]
        return F.struct(l_new.alias("l"), b_new.alias("b"))

    state = df.select(
        F.aggregate(
            F.slice(pairs, 2, F.size("xs") - 1), F.element_at(pairs, 1), step
        ).alias("st")
    ).collect()[0].st
    # Bit-identical, not approximately equal: the fold runs the same
    # IEEE ops in the same order as the loop.
    assert state.l == l and state.b == t


def test_ols_recovers_exact_linear_series(spark, tmp_path):
    # One product, one sale per week for 20 consecutive Sundays with
    # quantity = 5 + 3*t: slope 3, intercept 5, r2 = 1 exactly.
    base = datetime.datetime(2024, 1, 7)  # a Sunday
    rows = [
        (
            t,
            77,
            1,
            1,
            float(5 + 3 * (t + 1)),
            100.0,
            0.0,
            0.0,
            "N",
            "O",
            base + datetime.timedelta(weeks=t),
        )
        for t in range(20)
    ]
    _write_lineitem(spark, str(tmp_path), rows)
    out = q_ols_demand_trend(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n == 20
    assert r.slope == 3.0 and r.intercept == 5.0 and r.r2 == 1.0


def test_holt_constant_series_is_flat(spark, tmp_path):
    # Constant demand: level converges to the constant, trend stays 0,
    # forecast equals the constant — for any alpha/beta.
    base = datetime.datetime(2024, 1, 7)
    rows = [
        (t, 9, 1, 1, 7.0, 100.0, 0.0, 0.0, "N", "O", base + datetime.timedelta(weeks=t))
        for t in range(15)
    ]
    _write_lineitem(spark, str(tmp_path), rows)
    out = q_holt_linear_forecast(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.level == 7.0 and r.trend == 0.0 and r.forecast_h4 == 7.0


def test_pagerank_is_a_distribution(spark):
    rows = q_pagerank_events(spark, SF_SMOKE).collect()
    assert len(rows) >= 2
    total = sum(r.pr_x10k for r in rows)
    # Scaled by 1e4: a probability distribution sums to ~1e4 (the
    # per-iteration quantization moves it by < 1e-6 per node).
    assert abs(total - 10000.0) < 1.0
    assert all(r.pr_x10k > 0 for r in rows)


def test_gopher_rules_on_crafted_docs(spark, tmp_path):
    good = (
        "the quick brown fox jumps over a lazy dog and keeps running for "
        "a while with steady pace across the field of green grass under "
        "the bright morning sun while birds sing songs of the new day in "
        "the tall trees near the old stone wall by the quiet river bend"
    )
    bullets = "\n".join(f"- item {i}" for i in range(10))
    short = "too short"
    spark.createDataFrame(
        [(1, good, "en", "web", len(good)),
         (2, bullets, "en", "web", len(bullets)),
         (3, short, "en", "web", len(short))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {r.doc_id: r for r in q_gopher_quality(spark, str(tmp_path)).collect()}
    assert out[1].gopher_keep
    assert not out[2].bullet_ok and not out[2].gopher_keep
    assert not out[3].words_ok and not out[3].gopher_keep


def test_pricing_summary_pushes_filter_and_partial_aggs(spark):
    df = q_pricing_summary(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Ship-date predicate reaches the parquet scan; aggregation is
    # two-phase (map-side partial before the 2-key exchange).
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:300]
    assert "partial" in plan.lower()


def test_ols_matches_numpy_lstsq(spark):
    # Differential check against an independent implementation:
    # numpy's least squares on the same dense series.
    import numpy as np
    import pandas as pd

    out = q_ols_demand_trend(spark, SF_SMOKE).toPandas().set_index("product_id")
    from dataframe_retail_e_inventarios_spark.operators.cleaning import clean_sales
    from dataframe_retail_e_inventarios_spark.operators.resample import (
        weekly_dense_resample,
    )
    from dataframe_retail_e_inventarios_spark.sources.readers import load_table

    dense = weekly_dense_resample(
        clean_sales(load_table(spark, SF_SMOKE, "lineitem")),
        ["product_id"],
        "invoice_date",
        "units_sold",
    ).toPandas()
    checked = 0
    for pid, g in dense.groupby("product_id"):
        if pid not in out.index or checked >= 25:
            continue
        y = g.sort_values("week")["units_sold"].round().to_numpy()
        x = np.arange(1, len(y) + 1, dtype=float)
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(out.loc[pid, "slope"] - slope) < 1e-3, pid
        assert abs(out.loc[pid, "intercept"] - intercept) < 1e-3, pid
        checked += 1
    assert checked == 25


def test_theta_combines_trend_and_ses(spark, tmp_path):
    # Exact linear series: theta-2 line SES equals the series' own
    # z-values' smoothing; the combination must sit between the two
    # components, and the linear component extrapolates exactly.
    base = datetime.datetime(2024, 1, 7)
    rows = [
        (
            t,
            5,
            1,
            1,
            float(10 + 2 * (t + 1)),
            100.0,
            0.0,
            0.0,
            "N",
            "O",
            base + datetime.timedelta(weeks=t),
        )
        for t in range(16)
    ]
    _write_lineitem(spark, str(tmp_path), rows)
    from dataframe_retail_e_inventarios_spark.plans.queries_trend import (
        q_theta_forecast,
    )

    out = q_theta_forecast(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    # Linear extrapolation at h=4: 10 + 2*(16+4) = 50.
    assert r.linear_h4 == 50.0
    # On a perfect line the theta-2 line z_t = 2y_t - (a+bt) = y_t, so
    # its SES stays below the last value and above the first.
    assert 12.0 <= r.ses_theta2 <= 42.0
    assert min(r.linear_h4, r.ses_theta2) <= r.theta_forecast_h4 <= max(
        r.linear_h4, r.ses_theta2
    )


def test_mann_kendall_detects_monotone_trend(spark, tmp_path):
    # Strictly increasing series: S = n(n-1)/2 (every pair positive),
    # z > 1.96 -> increasing.
    base = datetime.datetime(2024, 1, 7)
    rows = [
        (
            t,
            3,
            1,
            1,
            float(1 + t),
            100.0,
            0.0,
            0.0,
            "N",
            "O",
            base + datetime.timedelta(weeks=t),
        )
        for t in range(20)
    ]
    _write_lineitem(spark, str(tmp_path), rows)
    from dataframe_retail_e_inventarios_spark.plans.queries_trend import (
        q_mann_kendall,
    )

    out = q_mann_kendall(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.s_stat == 20 * 19 // 2
    assert r.trend == "increasing" and r.z > 1.96


def test_model_selection_prefers_trend_aware_on_linear_series(spark, tmp_path):
    # Strongly trending series: the constant MA(4) forecast must lose
    # to the trend-aware members; a constant series is a three-way tie
    # broken deterministically in favor of 'holt'.
    from dataframe_retail_e_inventarios_spark.plans.queries_trend import (
        q_forecast_model_selection,
    )

    base = datetime.datetime(2024, 1, 7)
    rows = [
        (t, 1, 1, 1, float(10 + 5 * (t + 1)), 100.0, 0.0, 0.0, "N", "O",
         base + datetime.timedelta(weeks=t))
        for t in range(30)
    ] + [
        (100 + t, 2, 1, 1, 20.0, 100.0, 0.0, 0.0, "N", "O",
         base + datetime.timedelta(weeks=t))
        for t in range(30)
    ]
    _write_lineitem(spark, str(tmp_path), rows)
    out = {r.product_id: r for r in q_forecast_model_selection(spark, str(tmp_path)).collect()}
    trending, constant = out[1], out[2]
    assert trending.mape_holt < trending.mape_ma4
    assert trending.best_model in ("holt", "theta")
    assert constant.mape_ma4 == constant.mape_holt == constant.mape_theta == 0.0
    assert constant.best_model == "holt"  # deterministic tie-break


def test_acf_detects_period_4_cycle(spark, tmp_path):
    # Perfect period-4 demand: ACF at lag 4 is ~1, lag 1 well below.
    from dataframe_retail_e_inventarios_spark.plans.queries_trend import (
        q_autocorrelation,
    )

    base = datetime.datetime(2024, 1, 7)
    pattern = [10.0, 40.0, 25.0, 5.0]
    rows = [
        (t, 8, 1, 1, pattern[t % 4], 100.0, 0.0, 0.0, "N", "O",
         base + datetime.timedelta(weeks=t))
        for t in range(32)
    ]
    _write_lineitem(spark, str(tmp_path), rows)
    out = q_autocorrelation(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    # The sample estimator's numerator has n-k terms against a full-n
    # denominator, so a PERFECT cycle measures exactly (n-k)/n.
    assert r.acf_4 == (32 - 4) / 32 and r.acf_8 == (32 - 8) / 32
    assert r.acf_1 < r.acf_4 - 0.5


def test_eoq_square_root_law(spark, tmp_path):
    # Wilson formula on a known demand: 20 units/week over 26 weeks ->
    # D = 1040/yr, EOQ = sqrt(2*1040*50/2) = sqrt(52000).
    from dataframe_retail_e_inventarios_spark.plans.queries_trend import q_eoq

    base = datetime.datetime(2024, 1, 7)
    rows = [
        (t, 4, 1, 1, 20.0, 100.0, 0.0, 0.0, "N", "O", base + datetime.timedelta(weeks=t))
        for t in range(26)
    ]
    _write_lineitem(spark, str(tmp_path), rows)
    out = q_eoq(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.annual_demand == 1040.0
    assert abs(r.eoq_units - 52000 ** 0.5) < 1e-3


def test_demand_mode_tie_breaks_to_smallest_value(spark, tmp_path):
    # Two demand levels with equal counts: the mode must be the
    # smaller value (deterministic tie-break), never engine whim.
    from dataframe_retail_e_inventarios_spark.plans.queries_trend import q_demand_mode

    base = datetime.datetime(2024, 1, 7)
    qty = [30.0, 10.0, 30.0, 10.0, 5.0]
    rows = [
        (t, 6, 1, 1, q, 100.0, 0.0, 0.0, "N", "O", base + datetime.timedelta(weeks=t))
        for t, q in enumerate(qty)
    ]
    _write_lineitem(spark, str(tmp_path), rows)
    out = q_demand_mode(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.mode_demand == 10 and r.mode_weeks == 2 and r.n_distinct_levels == 3
