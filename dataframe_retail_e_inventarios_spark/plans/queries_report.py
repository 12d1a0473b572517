"""Report-stage queries: the generador.py analytics over a forecast-
results-shaped input [SURVEY §2.2 P2/P9/P10, §2.4 A8-A10, §2.7 M9,
§2.8 T1-T5].

The input is synthesized deterministically from lineitem inside the
query (both engines build the identical table, including the
reference's stringified-list Forecast column), so the whole
generador.py chain — strict string parse, derived columns, banding,
global summary — is oracle-checked end to end.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.arrays import ARRAY_TOTAL_SQL, PARSE_FLOAT_LIST_SQL
from ..registry import register
from ..sources.readers import load_table
from .report import add_report_text, global_summary, prepare_report_input


def _synth_results(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-results-shaped table from lineitem per (flag+status,
    supplier). Every numeric embedded in the Forecast string is
    %.2f-formatted from an exactly-computed value, so both engines
    render identical strings."""
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy(
        F.concat("l_returnflag", "l_linestatus").alias("SKU"),
        F.col("l_suppkey").cast("string").alias("Store"),
    ).agg(
        F.avg("l_quantity").alias("avg_q"),
        F.max("l_quantity").alias("max_q"),
        F.min("l_quantity").alias("min_q"),
        F.sum("l_quantity").alias("sum_q"),
        F.avg("l_discount").alias("avg_d"),
    )
    fmt = lambda c: F.format_string("%.2f", F.round(c, 2))  # noqa: E731
    return g.select(
        "SKU",
        "Store",
        F.round(F.col("avg_d") * 700, 3).alias("MAPE"),
        F.concat(
            F.lit("["),
            F.concat_ws(
                ", ",
                fmt(F.col("avg_q")),
                fmt(F.col("max_q")),
                fmt(F.col("min_q")),
                fmt(F.col("avg_q") * 0.5),
            ),
            F.lit("]"),
        ).alias("Forecast"),
        F.col("avg_q").alias("Safety_Stock"),
        (F.col("avg_q") * 1.5).alias("Reorder_Point"),
        F.greatest(F.lit(0.0), F.col("avg_q") - 26).alias("Qty_to_Order"),
        F.round(F.col("sum_q") / 1000, 2).alias("Runtime_sec"),
    )


_SYNTH_SQL = """
synth AS (
  SELECT l_returnflag || l_linestatus AS SKU,
         CAST(l_suppkey AS VARCHAR) AS Store,
         round(avg(l_discount) * 700, 3) AS MAPE,
         '[' || concat_ws(', ',
             printf('%.2f', round(avg(l_quantity), 2)),
             printf('%.2f', round(max(l_quantity), 2)),
             printf('%.2f', round(min(l_quantity), 2)),
             printf('%.2f', round(avg(l_quantity) * 0.5, 2))) || ']' AS Forecast,
         avg(l_quantity) AS Safety_Stock,
         avg(l_quantity) * 1.5 AS Reorder_Point,
         greatest(0.0, avg(l_quantity) - 26) AS Qty_to_Order,
         round(sum(l_quantity) / 1000, 2) AS Runtime_sec
  FROM lineitem GROUP BY 1, 2
)"""


# -- the full generador load/clean/derive chain ----------------------------
def q_report_enrich(
    spark: SparkSession,
    sf_dir: str,
    *,
    band_lo: float = 10.0,
    band_hi: float = 50.0,
) -> DataFrame:
    """Band edges fuzz-injectable (tools/fuzz_oracles.py)."""
    df = prepare_report_input(_synth_results(spark, sf_dir))
    df = add_report_text(df, band_lo, band_hi)
    return df.select(
        "StockCode",
        "StoreID",
        F.round("MAPE", 3).alias("MAPE"),
        "Forecast_Total",
        "Forecast_Weeks",
        "Safety_Stock",
        "Reorder_Point",
        "Qty_to_Order",
        "Need_Reorder",
        F.round("RMSE", 2).alias("RMSE"),
        "banda",
        "banda_color",
        "pedido",
    )


_PARSE = PARSE_FLOAT_LIST_SQL.format(c="coalesce(Forecast, '[]')")


def report_enrich_sql(band_lo: float = 10.0, band_hi: float = 50.0) -> str:
    return f"""
WITH {_SYNTH_SQL.strip()},
parsed AS (
  SELECT SKU AS StockCode, Store AS StoreID, MAPE,
         {_PARSE} AS Forecast_List,
         Safety_Stock, Reorder_Point, Qty_to_Order, Runtime_sec
  FROM synth
),
derived AS (
  SELECT StockCode, StoreID, MAPE,
         {ARRAY_TOTAL_SQL.format(c="Forecast_List")} AS Forecast_Total_raw,
         CAST(len(Forecast_List) AS BIGINT) AS Forecast_Weeks,
         Safety_Stock, Reorder_Point, Qty_to_Order,
         Qty_to_Order > 0 AS Need_Reorder,
         CAST(0.0 AS DOUBLE) AS RMSE
  FROM parsed
  WHERE Forecast_List IS NOT NULL AND MAPE IS NOT NULL
        AND Qty_to_Order IS NOT NULL
)
SELECT StockCode, StoreID, round(MAPE, 3) AS MAPE,
  CAST(round_even(Forecast_Total_raw, 0) AS BIGINT) AS Forecast_Total,
  Forecast_Weeks,
  CAST(round_even(Safety_Stock, 0) AS BIGINT) AS Safety_Stock,
  CAST(round_even(Reorder_Point, 0) AS BIGINT) AS Reorder_Point,
  CAST(round_even(Qty_to_Order, 0) AS BIGINT) AS Qty_to_Order,
  Need_Reorder,
  round(RMSE, 2) AS RMSE,
  CASE WHEN MAPE < {band_lo} THEN 'alta precision'
       WHEN MAPE < {band_hi} THEN 'aceptable'
       ELSE 'baja precision' END AS banda,
  CASE WHEN MAPE < {band_lo} THEN 'green'
       WHEN MAPE < {band_hi} THEN 'orange'
       ELSE 'red' END AS banda_color,
  CASE WHEN Need_Reorder THEN printf(
         'RECOMENDACION CLAVE: Se debe realizar un pedido de %d unidades para evitar una posible rotura de stock.',
         CAST(round_even(Qty_to_Order, 0) AS BIGINT))
       ELSE 'RECOMENDACION CLAVE: No se requiere realizar un pedido inmediato (el inventario actual esta por encima del ROP).'
  END AS pedido
FROM derived
"""


register("report_enrich", q_report_enrich, report_enrich_sql())


# -- A8-A10: global summary (generador.py:180-183) -------------------------
def q_report_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return global_summary(prepare_report_input(_synth_results(spark, sf_dir)))


register(
    "report_global_summary",
    q_report_summary,
    f"""
WITH {_SYNTH_SQL.strip()},
parsed AS (
  SELECT MAPE, Qty_to_Order,
         {_PARSE} AS Forecast_List
  FROM synth
),
derived AS (
  SELECT MAPE, Qty_to_Order > 0 AS Need_Reorder
  FROM parsed
  WHERE Forecast_List IS NOT NULL AND MAPE IS NOT NULL AND Qty_to_Order IS NOT NULL
)
SELECT CAST(count(*) AS BIGINT) AS n_series,
       CAST(count_if(Need_Reorder) AS BIGINT) AS n_reorder,
       round(avg(MAPE), 2) AS avg_mape
FROM derived
""",
)


# -- T1 edge cases: strict atomic parse on malformed strings ---------------
def q_parse_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exercise the parse on the reference's edge corpus
    (generador.py:53-64): empty, blank, malformed element, nulls."""
    from ..functions.arrays import array_len, array_total, parse_float_list

    # Deterministic subset (a bare limit() picks arbitrary rows and
    # would never match the oracle's row set).
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 60 == 0)
    cases = li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_linenumber") % 5 == 0, F.lit("[]"))
        .when(F.col("l_linenumber") % 5 == 1, F.lit(""))
        .when(F.col("l_linenumber") % 5 == 2, F.lit("[1.5, 2.5, 3.0]"))
        .when(F.col("l_linenumber") % 5 == 3, F.lit("[oops, 3.0]"))
        .otherwise(F.lit(None).cast("string"))
        .alias("s"),
    )
    parsed = cases.withColumn("lst", parse_float_list(F.coalesce("s", F.lit("[]"))))
    return parsed.select(
        "l_orderkey",
        "l_linenumber",
        array_total("lst").alias("total"),
        array_len("lst").alias("weeks"),
    )


_PARSE_S = PARSE_FLOAT_LIST_SQL.format(c="coalesce(s, '[]')")
register(
    "parse_forecast_edge_cases",
    q_parse_edges,
    f"""
WITH cases AS (
  SELECT l_orderkey, l_linenumber,
    CASE WHEN l_linenumber % 5 = 0 THEN '[]'
         WHEN l_linenumber % 5 = 1 THEN ''
         WHEN l_linenumber % 5 = 2 THEN '[1.5, 2.5, 3.0]'
         WHEN l_linenumber % 5 = 3 THEN '[oops, 3.0]'
         ELSE NULL END AS s
  FROM lineitem WHERE l_orderkey % 60 = 0
)
SELECT l_orderkey, l_linenumber,
       {ARRAY_TOTAL_SQL.format(c=_PARSE_S)} AS total,
       CAST(len({_PARSE_S}) AS BIGINT) AS weeks
FROM cases
""",
)
