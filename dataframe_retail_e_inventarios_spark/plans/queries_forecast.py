"""Model-UDF and multimodal queries [SURVEY §2.9 U1-U6, §2.11 N5].

``forecast_udf_ensemble`` is the applyInPandas port of the reference's
process_sku — non-SQL-expressible once Prophet/Holt-Winters are
present, so it's registered rows-only (the driver records the weaker
check; pytest differential-tests it against the native flagship).

``multimodal_features`` runs the Arrow mapInPandas plumbing but its
stub features are pure byte functions, so it IS oracle-checked —
proving the UDF transport (schema, batching, binary columns) is exact.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.cleaning import clean_sales
from ..operators.forecast_udf import forecast_with_models
from ..operators.multimodal import (
    documents_as_media,
    extract_media_features,
    media_features_native,
)
from ..operators.resample import weekly_dense_resample
from ..registry import register
from ..sources.readers import load_table
from .flagship import KEYS


def q_forecast_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    dense = weekly_dense_resample(
        clean_sales(load_table(spark, sf_dir, "lineitem")), KEYS, "invoice_date", "units_sold"
    )
    res = forecast_with_models(dense)
    # Arrays are kept for consumers; the registered check is rows-only.
    return res.select(
        "SKU",
        "Store",
        "MAPE",
        "Safety_Stock",
        "Reorder_Point",
        "Qty_to_Order",
        F.round(F.element_at("Forecast", 1), 4).alias("forecast_wk1"),
    )


register("forecast_udf_ensemble", q_forecast_udf, None)  # model fits: rows-only


def q_forecast_udf_ma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME applyInPandas pipeline restricted to its deterministic
    MA member (``ma_only=True``): with one member the median ensemble
    equals the MA forecast, making every output SQL-expressible — so
    the full pandas-side path (gating, winsorize clip, train/test
    split, safe-MAPE, SS/ROP/Q int rounding, Arrow transport) runs
    under the driver's hash gate, not just rows-only. The model-fit
    members stay covered by the differential tests."""
    dense = weekly_dense_resample(
        clean_sales(load_table(spark, sf_dir, "lineitem")), KEYS, "invoice_date", "units_sold"
    )
    res = forecast_with_models(dense, ma_only=True)
    return res.select(
        "SKU",
        "Store",
        "MAPE",
        "Safety_Stock",
        "Reorder_Point",
        "Qty_to_Order",
        F.round(F.element_at("Forecast", 1), 4).alias("forecast_wk1"),
    )


def _ensemble_ma_oracle() -> str:
    from .flagship import flagship_stats_ctes

    # Identical math to the flagship oracle (driver-green since r1);
    # only the projection matches process_series' output contract:
    # string keys, Python-round half-even (= round_even) MAPE/ints.
    return f"""
WITH {flagship_stats_ctes()}
SELECT CAST(product_id AS VARCHAR) AS SKU,
       CAST(store_id AS VARCHAR) AS Store,
       round_even(mape_raw, 3) AS MAPE,
       CAST(round_even(greatest(0.0, ss), 0) AS BIGINT) AS Safety_Stock,
       CAST(round_even(greatest(0.0, rop), 0) AS BIGINT) AS Reorder_Point,
       CAST(round_even(greatest(0.0, rop - last_stock), 0) AS BIGINT) AS Qty_to_Order,
       round(ens, 4) AS forecast_wk1
FROM inv
"""


register("forecast_udf_ensemble_native", q_forecast_udf_ma, _ensemble_ma_oracle())


_MULTIMODAL_ORACLE = """
SELECT doc_id,
       'text/plain' AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS payload_len,
       lower(hex(encode(substr(text, 1, 8)))) AS header_hex,
       md5(text) AS content_md5
FROM documents
"""


def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production path: the stub features are all SQL-expressible, so
    the registered query is pure built-ins (JVM-side, codegen) — no
    Python round trip for features a real pipeline computes natively."""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return media_features_native(media)


register("multimodal_features", q_multimodal, _MULTIMODAL_ORACLE)


def q_multimodal_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension-point path: the SAME features through the Arrow
    mapInPandas decoder contract (the shape real codecs plug into).
    Oracle-checked too — proving the UDF transport (schema, batching,
    binary columns) is byte-exact with the native plan."""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return extract_media_features(media)


register("multimodal_features_udf", q_multimodal_udf, _MULTIMODAL_ORACLE)
