"""Property tests (hypothesis) for the trend family's numeric cores:
the Spark-side folds and closed forms must match plain-Python
references on arbitrary series — same spirit as the CDC fold property
test, but over in-memory arrays (no parquet round trip)."""

import math

import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from dataframe_retail_e_inventarios_spark.plans.queries_trend import (
    HOLT_ALPHA,
    HOLT_BETA,
)

_series = st.lists(
    st.floats(min_value=0.0, max_value=1e6, allow_nan=False, allow_infinity=False),
    min_size=2,
    max_size=40,
)


@settings(max_examples=15, deadline=None)
@given(_series)
def test_holt_fold_matches_python_on_random_series(spark, xs):
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

    st_ = df.select(
        F.aggregate(
            F.slice(pairs, 2, F.size("xs") - 1), F.element_at(pairs, 1), step
        ).alias("st")
    ).collect()[0].st
    assert st_.l == l and st_.b == t  # bit-identical


_int_series = st.lists(st.integers(min_value=0, max_value=10_000), min_size=3, max_size=40)


@settings(max_examples=15, deadline=None)
@given(_int_series)
def test_mann_kendall_s_matches_naive_pairs(spark, ys):
    s_ref = sum(
        (0 < ys[j] - ys[i]) - (ys[j] - ys[i] < 0)
        for j in range(len(ys))
        for i in range(j)
    )
    df = spark.createDataFrame([([float(y) for y in ys],)], "xs array<double>")
    ysc = F.transform(F.col("xs"), lambda x: x.cast("long"))
    df = df.select(ysc.alias("ys"), F.size(ysc).cast("long").alias("m"))
    s_stat = F.aggregate(
        F.sequence(F.lit(2).cast("long"), F.col("m")),
        F.lit(0).cast("long"),
        lambda acc, j: acc
        + F.aggregate(
            F.sequence(F.lit(1).cast("long"), j - 1),
            F.lit(0).cast("long"),
            lambda acc2, i: acc2
            + F.signum(
                (
                    F.element_at(F.col("ys"), j.cast("int"))
                    - F.element_at(F.col("ys"), i.cast("int"))
                ).cast("double")
            ).cast("long"),
        ),
    )
    assert df.select(s_stat.alias("s")).collect()[0].s == s_ref


@settings(max_examples=15, deadline=None)
@given(_int_series)
def test_ols_moments_closed_form_matches_numpy(spark, ys):
    import numpy as np

    if len(set(ys)) == 1 and len(ys) < 2:
        return
    x = list(range(1, len(ys) + 1))
    n = len(ys)
    sx, sy = sum(x), sum(ys)
    sxy = sum(a * b for a, b in zip(x, ys))
    sxx = sum(a * a for a in x)
    den = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / den
    intercept = (sy - slope * sx) / n
    np_slope, np_intercept = np.polyfit(np.array(x, dtype=float), np.array(ys, dtype=float), 1)
    scale = max(1.0, abs(np_slope))
    assert abs(slope - np_slope) < 1e-6 * scale
    assert abs(intercept - np_intercept) < 1e-4 * max(1.0, abs(np_intercept))


def test_series_arrays_calendar_bounded_at_520_weeks(spark):
    """The trend family's one per-group materialization is the dense
    weekly series array; its length must be bounded by the CALENDAR
    SPAN (520 weeks here — a decade of weekly data), not by fact row
    volume. A synthetic fact with 10 rows per (product, week) must
    produce n = 520 exactly (the weekly pre-aggregation collapses the
    volume axis before collection), and the theta math over the long
    series must match an independent Python reference."""
    import datetime

    from dataframe_retail_e_inventarios_spark.plans.queries_trend import (
        HOLT_HORIZON,
        THETA_ALPHA,
        q_theta_forecast,
    )

    n_weeks, rows_per_week = 520, 10
    start = datetime.date(2015, 1, 4)  # a Sunday: stable W-SUN labels
    rows = []
    for pid in (1, 2):
        for wk in range(n_weeks):
            d = start + datetime.timedelta(weeks=wk)
            for r in range(rows_per_week):
                # per-row units; weekly total = 10*(wk%7) + pid
                u = float(wk % 7) + (0.1 * pid if r == 0 else 0.0) * 10
                rows.append((pid, d, float(wk % 7) + (pid if r == 0 else 0)))
    sales = spark.createDataFrame(
        rows, "product_id long, invoice_date date, units_sold double"
    )
    out = q_theta_forecast(spark, "unused", sales=sales).toPandas()
    assert len(out) == 2
    # Calendar bound: 5200 input rows per product -> arrays of 520.
    assert (out["n"] == n_weeks).all()

    # Independent reference for one product.
    weekly = {}
    for pid, d, u in rows:
        if pid == 1:
            weekly[d] = weekly.get(d, 0.0) + u
    ys = [round(weekly[k]) for k in sorted(weekly)]
    n = len(ys)
    sy = sum(ys)
    sxy = sum((i + 1) * y for i, y in enumerate(ys))
    sx = n * (n + 1) / 2
    sxx = n * (n + 1) * (2 * n + 1) / 6
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    z = [2.0 * y - (intercept + slope * (i + 1)) for i, y in enumerate(ys)]
    ses = z[0]
    for x in z[1:]:
        ses = THETA_ALPHA * x + (1 - THETA_ALPHA) * ses
    linear_h4 = intercept + slope * (n + HOLT_HORIZON)
    expected = max(0.5 * linear_h4 + 0.5 * ses, 0.0)
    got = float(out.set_index("product_id").loc[1, "theta_forecast_h4"])
    assert math.isclose(got, expected, rel_tol=1e-6, abs_tol=1e-4)
