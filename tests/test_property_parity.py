"""Seeded-batch property tests: many random inputs, one Spark job,
vectorized comparison against pandas / the literal reference code."""

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from dataframe_retail_e_inventarios_spark.functions.arrays import (
    array_len,
    array_total,
    parse_float_list,
)
from dataframe_retail_e_inventarios_spark.operators.resample import week_ending_sunday

RNG = np.random.default_rng(42)


def test_week_label_property_vs_pandas(spark):
    # 500 random timestamps over 1971-2069, any time of day.
    secs = RNG.integers(31_000_000, 3_100_000_000, size=500)
    ts = pd.to_datetime(secs, unit="s")
    pdf = pd.DataFrame({"i": range(len(ts)), "ts": ts})
    sdf = spark.createDataFrame(pdf)
    got = (
        sdf.select("i", week_ending_sunday("ts", is_instant=True).alias("wk"))
        .toPandas()
        .sort_values("i")["wk"]
        .to_numpy()
    )
    expected = ts.to_series().dt.to_period("W-SUN").dt.end_time.dt.date.to_numpy()
    assert (got == expected).all()


def _reference_parse(forecast_str):
    """Literal port of generador.py:48-64."""
    try:
        cleaned = str(forecast_str).strip().replace("[", "").replace("]", "")
        if not cleaned:
            return [], 0.0, 0
        lst = [float(x.strip()) for x in cleaned.split(",") if x.strip()]
        return lst, sum(lst), len(lst)
    except Exception:
        return [], 0.0, 0


def test_parse_property_vs_reference(spark):
    cases = []
    for _ in range(200):
        n = int(RNG.integers(0, 6))
        vals = np.round(RNG.uniform(-100, 100, size=n), int(RNG.integers(0, 5)))
        s = "[" + ", ".join(str(v) for v in vals) + "]"
        cases.append(s)
    # mutations: junk elements, missing brackets, extra whitespace
    for base in cases[:50]:
        cases.append(base.replace("[", "").replace("]", ""))
        cases.append(base[:-1] + ", junk]")
        cases.append("  " + base + "  ")
    cases += ["", "[]", "[ ]", "[,]", "[1e3, 2E-2]", "[nan]", "[inf, -inf]"]

    pdf = pd.DataFrame({"i": range(len(cases)), "s": cases})
    sdf = spark.createDataFrame(pdf)
    got = (
        sdf.select(
            "i",
            array_total(parse_float_list("s")).alias("total"),
            array_len(parse_float_list("s")).alias("n"),
        )
        .toPandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    for i, s in enumerate(cases):
        _, exp_total, exp_n = _reference_parse(s)
        assert got.loc[i, "n"] == exp_n, (s, got.loc[i, "n"], exp_n)
        g = got.loc[i, "total"]
        if np.isnan(exp_total):
            assert np.isnan(g), s
        else:
            assert abs(g - exp_total) <= 1e-9 * max(1.0, abs(exp_total)), (s, g, exp_total)
