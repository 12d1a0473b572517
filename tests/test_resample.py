"""Dense W-SUN weekly resample must match pandas exactly
(SURVEY §7.4 hard part #1: label edges + density)."""

import pandas as pd
import pyspark.sql.functions as F
import pytest

from dataframe_retail_e_inventarios_spark.operators.resample import (
    weekly_dense_resample,
    week_ending_sunday,
)


@pytest.fixture(scope="module")
def raw():
    # Gaps (empty weeks), intraday Sundays, month boundaries.
    rows = [
        ("a", "x", "2023-01-01 15:00:00", 1.0),  # Sunday intraday
        ("a", "x", "2023-01-02 00:00:00", 2.0),  # Monday -> next Sunday
        ("a", "x", "2023-01-08 00:00:00", 4.0),  # Sunday midnight
        ("a", "x", "2023-02-04 10:30:00", 8.0),  # 3-week gap before this
        ("b", "y", "2023-03-15 00:00:00", 5.0),
        ("b", "y", "2023-03-19 23:59:59", 7.0),  # Sunday 23:59
    ]
    return pd.DataFrame(rows, columns=["pid", "sid", "ts", "units"]).assign(
        ts=lambda d: pd.to_datetime(d["ts"])
    )


def pandas_dense(raw: pd.DataFrame) -> pd.DataFrame:
    # The reference's exact sequence: PRACTICA3.py:90-94.
    out = []
    for (pid, sid), g in raw.groupby(["pid", "sid"]):
        s = (
            g.sort_values("ts")
            .set_index("ts")["units"]
            .resample("W-SUN")
            .sum()
            .fillna(0)
        )
        for wk, v in s.items():
            out.append((pid, sid, wk.date(), float(v)))
    return (
        pd.DataFrame(out, columns=["pid", "sid", "week", "units"])
        .sort_values(["pid", "sid", "week"])
        .reset_index(drop=True)
    )


def test_week_label_matches_pandas(spark, raw):
    sdf = spark.createDataFrame(raw)
    got = (
        sdf.select("ts", week_ending_sunday("ts").alias("wk"))
        .toPandas()
        .assign(expected=lambda d: pd.Series(raw["ts"]).dt.to_period("W-SUN").dt.end_time.dt.date)
    )
    assert (got["wk"] == got["expected"]).all(), got


def test_dense_resample_matches_pandas(spark, raw):
    sdf = spark.createDataFrame(raw)
    got = (
        weekly_dense_resample(sdf, ["pid", "sid"], "ts", "units")
        .toPandas()
        .sort_values(["pid", "sid", "week"])
        .reset_index(drop=True)
    )
    exp = pandas_dense(raw)
    assert len(got) == len(exp)
    assert (got["week"] == exp["week"]).all()
    assert (got["units"] == exp["units"]).all()
