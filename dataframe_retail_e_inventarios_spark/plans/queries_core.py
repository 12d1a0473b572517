"""Core query registrations: flagship + the dense-resample pipeline
stages as individually-oracle-checked queries [SURVEY §2.4 A1-A5].
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.cleaning import clean_sales
from ..operators.resample import weekly_dense_resample, weekly_resample_sum
from ..registry import register
from ..sources.readers import load_table
from . import oracle_fragments as OF
from .flagship import KEYS, flagship, flagship_oracle


def _sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    return clean_sales(load_table(spark, sf_dir, "lineitem"))


# -- flagship (entry point) -------------------------------------------------
register("flagship_inventory", flagship, flagship_oracle())


# -- A2/T7: weekly W-SUN resample, sparse ----------------------------------
def q_weekly_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return weekly_resample_sum(
        _sales(spark, sf_dir), KEYS, "invoice_date", "units_sold", out_col="units"
    ).select(*KEYS, "week", F.round("units", 2).alias("units"))


register(
    "weekly_resample_sparse",
    q_weekly_resample,
    f"""
WITH {OF.CLEAN_SALES_CTE.strip()}
SELECT product_id, store_id,
       CAST(invoice_date AS DATE)
         + CAST((7 - isodow(CAST(invoice_date AS DATE))) % 7 AS INTEGER) AS week,
       round(sum(units_sold), 2) AS units
FROM sales GROUP BY 1, 2, 3
""",
)


# -- A2 dense: the spine gap-fill ------------------------------------------
def q_weekly_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    dense = weekly_dense_resample(_sales(spark, sf_dir), KEYS, "invoice_date", "units_sold")
    return dense.select(*KEYS, "week", F.round("units_sold", 2).alias("units"))


register(
    "weekly_resample_dense",
    q_weekly_dense,
    f"""
WITH {OF.CLEAN_SALES_CTE.strip()},
{OF.WEEKLY_CTE.strip()},
{OF.DENSE_CTE.strip()}
SELECT product_id, store_id, week, round(units_sold, 2) AS units FROM dense
""",
)


# -- A1+A4+A5: group-by with HAVING gates (PRACTICA3.py:97-99) -------------
def q_series_gates(
    spark: SparkSession,
    sf_dir: str,
    *,
    min_weeks: int = 12,
    min_total: int = 10,
) -> DataFrame:
    """HAVING thresholds fuzz-injectable (tools/fuzz_oracles.py)."""
    # Pre-gate = the same thresholds the filter below applies (dense
    # count == span; integral sums make round(sum, 2) == sum) — the
    # filter below stays as the semantic gate.
    dense = weekly_dense_resample(
        _sales(spark, sf_dir), KEYS, "invoice_date", "units_sold",
        min_span_weeks=min_weeks, min_total=min_total,
    )
    return (
        dense.groupBy(*KEYS)
        .agg(
            F.count("*").alias("n_weeks"),
            F.round(F.sum("units_sold"), 2).alias("total_units"),
        )
        .filter((F.col("n_weeks") >= min_weeks) & (F.col("total_units") >= min_total))
    )


def series_admission_gates_sql(min_weeks: int = 12, min_total: int = 10) -> str:
    return f"""
WITH {OF.CLEAN_SALES_CTE.strip()},
{OF.WEEKLY_CTE.strip()},
{OF.DENSE_CTE.strip()}
SELECT product_id, store_id, count(*) AS n_weeks,
       round(sum(units_sold), 2) AS total_units
FROM dense GROUP BY 1, 2
HAVING count(*) >= {min_weeks} AND round(sum(units_sold), 2) >= {min_total}
"""


register("series_admission_gates", q_series_gates, series_admission_gates_sql())
