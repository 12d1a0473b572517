"""Raw-SQL query surface [SURVEY §2 parity-plus]: the engine's second
front door. Everything else in this repo is DataFrame-API; these
queries run through ``spark.sql`` over registered temp views to prove
the SQL surface (correlated EXISTS, correlated scalar subqueries —
shapes the DataFrame API has no direct operator for) compiles to the
same Catalyst plans and passes the same oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..sources.readers import load_table


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_v")


def q_sql_exists_returned(
    spark: SparkSession, sf_dir: str, *, flag: str = "R"
) -> DataFrame:
    """Correlated EXISTS (decorrelated by Catalyst into a left-semi
    join — same physical shape as the DataFrame semi-join query).
    Flag fuzz-injectable (tools/fuzz_oracles.py)."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        f"""
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders_v
        WHERE EXISTS (
          SELECT 1 FROM lineitem_v
          WHERE l_orderkey = o_orderkey AND l_returnflag = '{flag}'
        )
        GROUP BY o_orderpriority
        """
    )


def sql_exists_returned_orders_sql(flag: str = "R") -> str:
    return f"""
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_returnflag = '{flag}'
)
GROUP BY o_orderpriority
"""


register(
    "sql_exists_returned_orders",
    q_sql_exists_returned,
    sql_exists_returned_orders_sql(),
)


def q_sql_above_brand_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (per-brand average), decorrelated by
    Catalyst into an aggregate + join — no per-row re-scan."""
    _views(spark, sf_dir, "part")
    return spark.sql(
        """
        SELECT p_brand, count(*) AS n_above
        FROM part_v p
        WHERE p_retailprice > (
          SELECT avg(p_retailprice) FROM part_v p2 WHERE p2.p_brand = p.p_brand
        )
        GROUP BY p_brand
        """
    )


register(
    "sql_parts_above_brand_avg",
    q_sql_above_brand_avg,
    """
SELECT p_brand, count(*) AS n_above
FROM part p
WHERE p_retailprice > (
  SELECT avg(p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand
)
GROUP BY p_brand
""",
)
