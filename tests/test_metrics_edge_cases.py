"""Metric and parse edge cases from the reference's guard code
(SURVEY §5.2 #4): all-zero series, tiny groups, malformed arrays."""

import math

import pyspark.sql.functions as F

from dataframe_retail_e_inventarios_spark.functions.arrays import (
    array_len,
    array_total,
    parse_float_list,
)
from dataframe_retail_e_inventarios_spark.functions.metrics import mae, mape, rmse, smape
from dataframe_retail_e_inventarios_spark.operators.winsorize import winsorize_by_group


def _metric_row(spark, pairs):
    df = spark.createDataFrame(pairs, ["t", "p"])
    return df.agg(
        mape("t", "p").alias("mape"),
        smape("t", "p").alias("smape"),
        rmse("t", "p").alias("rmse"),
        mae("t", "p").alias("mae"),
    ).first()


def test_mape_all_zero_fallback(spark):
    # PRACTICA3.py:49-50: all-zero actuals -> plain MAE, not NaN/inf.
    r = _metric_row(spark, [(0.0, 2.0), (0.0, 4.0)])
    assert r.mape == 3.0  # mean(|0-2|, |0-4|)
    assert r.smape == 200.0  # all denominators nonzero here
    assert math.isclose(r.rmse, math.sqrt(10.0))


def test_mape_partial_zero_mask(spark):
    # zeros are masked out, not averaged in (PRACTICA3.py:48-51)
    r = _metric_row(spark, [(10.0, 8.0), (0.0, 5.0)])
    assert math.isclose(r.mape, 20.0)  # only the t=10 row counts


def test_smape_all_zero_denominator(spark):
    r = _metric_row(spark, [(0.0, 0.0), (0.0, 0.0)])
    assert r.smape == 0.0  # fallback MAE of zeros


def test_winsorize_passthrough_small_groups(spark):
    # <=5 positive values -> no clipping (PRACTICA3.py:104)
    rows = [("g", float(v)) for v in (1, 2, 3, 1000, 0, 0)]
    df = spark.createDataFrame(rows, ["k", "v"])
    out = winsorize_by_group(df, ["k"], "v", "w").toPandas()
    assert (out["w"] == out["v"]).all()  # 4 positives only -> untouched


def test_winsorize_clips_large_groups(spark):
    rows = [("g", float(v)) for v in (1, 1, 1, 1, 1, 1, 1, 1, 1, 1000)]
    df = spark.createDataFrame(rows, ["k", "v"])
    out = winsorize_by_group(df, ["k"], "v", "w").toPandas()
    assert out["w"].max() < 1000  # outlier clipped to p99
    assert out["w"].min() >= 1.0


def test_parse_float_list_edges(spark):
    cases = [
        ("[1.0, 2.5]", [1.0, 2.5], 3.5, 2),
        ("[]", [], 0.0, 0),
        ("", [], 0.0, 0),
        ("[oops, 3.0]", [], 0.0, 0),  # atomic failure (generador.py:62-64)
        ("[ 4.0 ,5.0 ]", [4.0, 5.0], 9.0, 2),
    ]
    df = spark.createDataFrame([(s,) for s, *_ in cases], ["s"])
    got = (
        df.withColumn("lst", parse_float_list("s"))
        .withColumn("total", array_total("lst"))
        .withColumn("n", array_len("lst"))
        .toPandas()
        .set_index("s")
    )
    for s, lst, total, n in cases:
        assert list(got.loc[s, "lst"]) == lst, s
        assert got.loc[s, "total"] == total, s
        assert got.loc[s, "n"] == n, s


def test_sketch_aggregates_within_tolerance(spark):
    """Approximate sketches (the 100 TB path for distincts/quantiles):
    HLL count-distinct within 5% of exact; approx percentile within the
    documented accuracy bound of exact."""
    from dataframe_retail_e_inventarios_spark.sources.readers import load_table
    from tests.conftest import SF_CORRECT

    li = load_table(spark, SF_CORRECT, "lineitem")
    r = li.agg(
        F.countDistinct("l_partkey").alias("exact_d"),
        F.approx_count_distinct("l_partkey").alias("approx_d"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("exact_p50"),
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("approx_p50"),
    ).first()
    assert abs(r.approx_d - r.exact_d) / r.exact_d < 0.05
    assert abs(r.approx_p50 - r.exact_p50) / r.exact_p50 < 0.01
