"""Parity-plus relational extras [SURVEY §2.4 note: grouping sets /
distinct aggregates come free from Catalyst; one demo query each so
the capability is oracle-locked].
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..sources.readers import load_table


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
    )


register(
    "rollup_sales_summary",
    q_rollup,
    """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       round(sum(l_quantity), 2) AS qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)


def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.count("*").alias("n_lines"),
    )


register(
    "distinct_counts_per_supplier",
    q_distinct_agg,
    """
SELECT l_suppkey,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_orderkey) AS n_orders,
       count(*) AS n_lines
FROM lineitem GROUP BY 1
""",
)


# -- M3: log1p/expm1 variance-stabilizing transform, native ---------------
# (the transform the reference applies around its model fits,
# PRACTICA3.py:118,124,132,137 — here as a checked round-trip + the
# transformed weekly series itself)
def q_log_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cleaning import clean_sales
    from ..operators.resample import weekly_resample_sum
    from .flagship import KEYS

    weekly = weekly_resample_sum(
        clean_sales(load_table(spark, sf_dir, "lineitem")),
        KEYS,
        "invoice_date",
        "units_sold",
        out_col="units",
    )
    log_u = F.log1p(F.greatest(F.col("units"), F.lit(0.0)))
    return weekly.select(
        *KEYS,
        "week",
        F.round(log_u, 6).alias("log_units"),
        F.round(F.expm1(log_u), 4).alias("roundtrip"),
    )


register(
    "log_transform_weekly",
    q_log_transform,
    """
WITH sales AS (
  SELECT l_partkey AS product_id, l_suppkey AS store_id,
         l_shipdate AS invoice_date,
         coalesce(TRY_CAST(l_quantity AS DOUBLE), 0.0) AS units_sold
  FROM lineitem
  WHERE coalesce(TRY_CAST(l_quantity AS DOUBLE), 0.0) >= 0
),
weekly AS (
  SELECT product_id, store_id,
         CAST(invoice_date AS DATE)
           + CAST((7 - isodow(CAST(invoice_date AS DATE))) % 7 AS INTEGER) AS week,
         sum(units_sold) AS units
  FROM sales GROUP BY 1, 2, 3
)
SELECT product_id, store_id, week,
       round(ln(1 + greatest(units, 0.0)), 6) AS log_units,
       round(exp(ln(1 + greatest(units, 0.0))) - 1, 4) AS roundtrip
FROM weekly
""",
)
