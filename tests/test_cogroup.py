"""§2.9 API-surface twins: cogrouped applyInPandas alignment vs the
native join, and mapInArrow vs mapInPandas vs native expressions."""

import datetime as dt

import pyspark.sql.functions as F

from dataframe_retail_e_inventarios_spark.operators.joins import (
    align_forecast_to_actuals,
    cogroup_align_pandas,
)
from dataframe_retail_e_inventarios_spark.operators.multimodal import (
    documents_as_media,
    extract_media_features,
    extract_media_features_arrow,
    media_features_native,
)
from dataframe_retail_e_inventarios_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE

D = dt.date


def test_cogroup_alignment_equals_native_join(spark):
    actuals = spark.createDataFrame(
        [
            (1, D(2024, 1, 7), 10.0),
            (1, D(2024, 1, 14), 12.0),
            (2, D(2024, 1, 7), 5.0),
            (3, D(2024, 1, 7), 7.0),  # series with no predictions
        ],
        "series long, week date, actual double",
    )
    preds = spark.createDataFrame(
        [
            (1, D(2024, 1, 7), 11.0),
            (1, D(2024, 1, 21), 99.0),  # date with no actual
            (2, D(2024, 1, 7), 4.0),
            (4, D(2024, 1, 7), 1.0),  # series with no actuals
        ],
        "series long, week date, pred double",
    )
    native = align_forecast_to_actuals(preds, actuals, on=["series", "week"])
    cog = cogroup_align_pandas(preds, actuals, ["series"], ["week"])
    cols = ["series", "week", "actual", "pred"]
    a = sorted(tuple(r) for r in native.select(cols).collect())
    b = sorted(tuple(r) for r in cog.select(cols).collect())
    assert a == b and len(a) == 2


def test_mapinarrow_matches_pandas_and_native(spark):
    media = documents_as_media(load_table(spark, SF_SMOKE, "documents").limit(100))
    native = media_features_native(media)
    via_pandas = extract_media_features(media)
    via_arrow = extract_media_features_arrow(media)
    shape = lambda df: [(f.name, f.dataType) for f in df.schema.fields]  # noqa: E731
    assert shape(via_arrow) == shape(via_pandas) == shape(native)
    n = native.count()
    assert via_arrow.count() == n > 0
    assert via_arrow.exceptAll(native).count() == 0
    assert native.exceptAll(via_arrow).count() == 0
    assert via_arrow.exceptAll(via_pandas).count() == 0
