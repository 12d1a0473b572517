"""EWMA fold semantics (plans/queries_scale.q_ewma_weekly_demand):
recursive s_t = a*x_t + (1-a)*s_{t-1}, seeded with x_1, over
week-sorted values — validated against a plain Python fold."""

import datetime as dt

import pyspark.sql.functions as F

from dataframe_retail_e_inventarios_spark.plans.queries_scale import EWMA_ALPHA


def _py_ewma(xs, a=EWMA_ALPHA):
    acc = xs[0]
    for x in xs[1:]:
        acc = a * x + (1 - a) * acc
    return acc


def test_ewma_matches_python_fold(spark):
    xs = [9.0, 14.0, 13.0, 8.0, 49.0, 50.0]
    weeks = [dt.date(2024, 1, 7) + dt.timedelta(days=7 * i) for i in range(len(xs))]
    df = spark.createDataFrame(
        [(w, x) for w, x in zip(weeks, xs)], "week date, x double"
    )
    a = EWMA_ALPHA
    arr = F.transform(
        F.sort_array(F.collect_list(F.struct("week", "x"))), lambda s: s["x"]
    )
    got = (
        df.agg(
            F.aggregate(
                F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
                F.element_at(arr, 1),
                lambda acc, x: a * x + (1 - a) * acc,
            ).alias("ewma")
        )
    ).first()["ewma"]
    assert got == _py_ewma(xs)  # bit-identical, not approx


def test_ewma_single_week_is_identity(spark):
    df = spark.createDataFrame([(dt.date(2024, 1, 7), 42.0)], "week date, x double")
    arr = F.transform(
        F.sort_array(F.collect_list(F.struct("week", "x"))), lambda s: s["x"]
    )
    got = (
        df.agg(
            F.aggregate(
                F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
                F.element_at(arr, 1),
                lambda acc, x: EWMA_ALPHA * x + (1 - EWMA_ALPHA) * acc,
            ).alias("ewma")
        )
    ).first()["ewma"]
    assert got == 42.0
