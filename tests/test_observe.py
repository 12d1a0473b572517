"""Observation-API quality gates (operators/observe.py): metrics
collected during the action, circuit breaker semantics."""

import pytest

from dataframe_retail_e_inventarios_spark.operators.observe import (
    assert_quality,
    observe_quality,
)
from dataframe_retail_e_inventarios_spark.operators.cleaning import clean_sales
from dataframe_retail_e_inventarios_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


def test_observe_collects_during_single_action(spark):
    sales = clean_sales(load_table(spark, SF_SMOKE, "lineitem"))
    observed, obs = observe_quality(sales, "units_sold")
    n = observed.count()  # ONE action: metrics ride along
    m = obs.get
    assert m["n_rows"] == n > 0
    assert m["n_null"] == 0
    assert m["n_negative"] == 0  # clean_sales filtered negatives
    assert 0 <= m["min_v"] <= m["max_v"]
    assert_quality(m)  # gate passes on clean data


def test_quality_gate_trips_on_nulls_and_negatives(spark):
    df = spark.createDataFrame(
        [(1.0,), (None,), (-3.0,), (2.0,)], "v double"
    )
    observed, obs = observe_quality(df, "v")
    observed.count()
    m = obs.get
    assert m["n_null"] == 1 and m["n_negative"] == 1
    with pytest.raises(ValueError, match="null fraction"):
        assert_quality(m)
    with pytest.raises(ValueError, match="negative"):
        assert_quality(m, max_null_frac=1.0)
    assert_quality(m, max_null_frac=1.0, allow_negative=True)


def test_quality_gate_trips_on_empty(spark):
    df = spark.createDataFrame([], "v double")
    observed, obs = observe_quality(df, "v")
    observed.count()
    with pytest.raises(ValueError, match="0 rows"):
        assert_quality(obs.get)
