"""Statistical operator queries [SURVEY §2.4 A6-A7, A16].

The two classic silent-mismatch traps live here (SURVEY §7.4):
exact linear-interpolation percentile (pandas default) and POPULATION
std-dev (np.std ddof=0) — checked value-for-value against DuckDB's
quantile_cont / stddev_pop.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..operators.cleaning import clean_sales
from ..operators.resample import weekly_dense_resample
from ..registry import register
from ..sources.readers import load_table
from . import oracle_fragments as OF
from .flagship import KEYS


def _dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    return weekly_dense_resample(
        clean_sales(load_table(spark, sf_dir, "lineitem")), KEYS, "invoice_date", "units_sold"
    )


# -- A6: exact per-series winsorization bounds (PRACTICA3.py:103-106) ------
def q_winsorize_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every series, with bounds only where winsorization applies
    (n_pos > 5, PRACTICA3.py:104) — null bounds mean pass-through."""
    pos = F.when(F.col("units_sold") > 0, F.col("units_sold"))
    agg = (
        _dense(spark, sf_dir)
        .groupBy(*KEYS)
        .agg(
            F.count(pos).alias("n_pos"),
            F.round(F.percentile(pos, F.lit(0.01)), 4).alias("_lo"),
            F.round(F.percentile(pos, F.lit(0.99)), 4).alias("_hi"),
        )
    )
    applies = F.col("n_pos") > 5
    return agg.select(
        *KEYS,
        "n_pos",
        F.when(applies, F.col("_lo")).alias("lower_q"),
        F.when(applies, F.col("_hi")).alias("upper_q"),
    )


register(
    "winsorize_bounds",
    q_winsorize_bounds,
    f"""
WITH {OF.CLEAN_SALES_CTE.strip()},
{OF.WEEKLY_CTE.strip()},
{OF.DENSE_CTE.strip()}
SELECT product_id, store_id, n_pos,
  CASE WHEN n_pos > 5 THEN lo END AS lower_q,
  CASE WHEN n_pos > 5 THEN hi END AS upper_q
FROM (
  SELECT product_id, store_id,
    count(CASE WHEN units_sold > 0 THEN 1 END) AS n_pos,
    round(quantile_cont(CASE WHEN units_sold > 0 THEN units_sold END, 0.01), 4) AS lo,
    round(quantile_cont(CASE WHEN units_sold > 0 THEN units_sold END, 0.99), 4) AS hi
  FROM dense GROUP BY 1, 2
)
""",
)


# -- A7: population std-dev of train demand (PRACTICA3.py:70) --------------
def q_sigma(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy(*KEYS).orderBy(F.col("week").desc())
    dense = _dense(spark, sf_dir).withColumn("rn", F.row_number().over(w))
    return (
        dense.groupBy(*KEYS)
        .agg(
            F.count("*").alias("n_weeks"),
            F.round(
                F.coalesce(F.stddev_pop(F.when(F.col("rn") > 4, F.col("units_sold"))), F.lit(0.0)),
                4,
            ).alias("sigma_pop"),
            # The wrong (sample) flavor, published so the suite proves
            # the two diverge and we picked the right one.
            F.round(
                F.coalesce(F.stddev_samp(F.when(F.col("rn") > 4, F.col("units_sold"))), F.lit(0.0)),
                4,
            ).alias("sigma_samp"),
        )
        .filter(F.col("n_weeks") >= 12)
    )


register(
    "demand_sigma_pop",
    q_sigma,
    f"""
WITH {OF.CLEAN_SALES_CTE.strip()},
{OF.WEEKLY_CTE.strip()},
{OF.DENSE_CTE.strip()},
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY product_id, store_id
                               ORDER BY week DESC) AS rn
  FROM dense
)
SELECT product_id, store_id, count(*) AS n_weeks,
  round(coalesce(stddev_pop(CASE WHEN rn > 4 THEN units_sold END), 0.0), 4) AS sigma_pop,
  round(coalesce(stddev_samp(CASE WHEN rn > 4 THEN units_sold END), 0.0), 4) AS sigma_samp
FROM ranked GROUP BY 1, 2
HAVING count(*) >= 12
""",
)


# -- A16: cross-model element-wise median ensemble (PRACTICA3.py:150-151) --
def q_ensemble_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three deterministic 'models' per series (trailing-4 MA, trailing-8
    MA, whole-train mean); the ensemble is the per-series median —
    unpivoted to rows and aggregated with exact median."""
    w = Window.partitionBy(*KEYS).orderBy(F.col("week").desc())
    dense = _dense(spark, sf_dir).withColumn("rn", F.row_number().over(w))
    rn = F.col("rn")
    models = dense.groupBy(*KEYS).agg(
        F.count("*").alias("n_weeks"),
        F.avg(F.when((rn > 4) & (rn <= 8), F.col("units_sold"))).alias("m_ma4"),
        F.avg(F.when((rn > 4) & (rn <= 12), F.col("units_sold"))).alias("m_ma8"),
        F.avg(F.when(rn > 4, F.col("units_sold"))).alias("m_mean"),
    ).filter(F.col("n_weeks") >= 12)
    unpivoted = models.select(
        *KEYS, F.explode(F.array("m_ma4", "m_ma8", "m_mean")).alias("pred")
    )
    return unpivoted.groupBy(*KEYS).agg(
        F.round(F.median("pred"), 4).alias("ensemble"),
        F.count("*").alias("n_models"),
    )


register(
    "ensemble_median",
    q_ensemble_median,
    f"""
WITH {OF.CLEAN_SALES_CTE.strip()},
{OF.WEEKLY_CTE.strip()},
{OF.DENSE_CTE.strip()},
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY product_id, store_id
                               ORDER BY week DESC) AS rn
  FROM dense
),
models AS (
  SELECT product_id, store_id, count(*) AS n_weeks,
    avg(CASE WHEN rn > 4 AND rn <= 8 THEN units_sold END) AS m_ma4,
    avg(CASE WHEN rn > 4 AND rn <= 12 THEN units_sold END) AS m_ma8,
    avg(CASE WHEN rn > 4 THEN units_sold END) AS m_mean
  FROM ranked GROUP BY 1, 2
  HAVING count(*) >= 12
),
unpivoted AS (
  SELECT product_id, store_id, unnest([m_ma4, m_ma8, m_mean]) AS pred
  FROM models
)
SELECT product_id, store_id, round(median(pred), 4) AS ensemble,
       count(*) AS n_models
FROM unpivoted GROUP BY 1, 2
""",
)
