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
