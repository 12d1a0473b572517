"""Data-quality constraint audit queries [SURVEY §2 parity-plus:
ingest contract gate for the 100 TB pipeline].

``dq_constraint_audit`` evaluates the fact/dimension contract the rest
of the engine assumes: primary-key uniqueness, referential integrity,
value ranges and sets, sane date bounds — one audit row per
constraint. The reference trusts its CSVs (limpieza_de_datos.py only
coerces); a production ingest runs exactly this gate on every batch
before the expensive joins, so the audit's plan shape (one
conditional-aggregate scan per table INCLUDING the key-uniqueness
rules (operators/dq.table_audit fuses them — one fact scan total) +
broadcast anti-joins for dimension FKs) is as important as its
answer.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.dq import (
    foreign_key_audit,
    table_audit,
    union_audits,
)
from ..registry import register
from ..sources.readers import load_table


def q_dq_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    part = load_table(spark, sf_dir, "part")

    li_rules = table_audit(
        li,
        checks=[
            ("li_quantity_positive", F.col("l_quantity") <= 0),
            (
                "li_discount_in_0_1",
                (F.col("l_discount") < 0) | (F.col("l_discount") > 1),
            ),
            (
                "li_returnflag_in_set",
                ~F.col("l_returnflag").isin("A", "N", "R"),
            ),
            (
                "li_shipdate_in_range",
                (F.col("l_shipdate") < F.lit("1992-01-01").cast("timestamp_ntz"))
                | (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp_ntz")),
            ),
            ("li_extendedprice_nonnull", F.col("l_extendedprice").isNull()),
        ],
        unique=[("li_pk_unique", ["l_orderkey", "l_linenumber"])],
    )
    ord_rules = table_audit(
        orders,
        checks=[
            ("ord_orderdate_nonnull", F.col("o_orderdate").isNull()),
            ("ord_totalprice_positive", F.col("o_totalprice") <= 0),
        ],
        unique=[("ord_pk_unique", ["o_orderkey"])],
    )
    audits = union_audits(
        li_rules,
        ord_rules,
        # orders is fact-sized at 100 TB: shuffle anti-join, no broadcast
        foreign_key_audit(
            li, "li_orderkey_fk", "l_orderkey", orders, "o_orderkey",
            broadcast_parent=False,
        ),
        foreign_key_audit(orders, "ord_custkey_fk", "o_custkey", customer, "c_custkey"),
        foreign_key_audit(li, "li_partkey_fk", "l_partkey", part, "p_partkey"),
    )
    return audits


_DQ_ORACLE = """
WITH li_wide AS (
  SELECT count(*) AS n,
    CAST(sum(CASE WHEN coalesce(l_quantity <= 0, TRUE) THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
    CAST(sum(CASE WHEN coalesce(l_discount < 0 OR l_discount > 1, TRUE) THEN 1 ELSE 0 END) AS BIGINT) AS v_disc,
    CAST(sum(CASE WHEN coalesce(l_returnflag NOT IN ('A','N','R'), TRUE) THEN 1 ELSE 0 END) AS BIGINT) AS v_rf,
    CAST(sum(CASE WHEN coalesce(l_shipdate < TIMESTAMP '1992-01-01'
                        OR l_shipdate >= TIMESTAMP '1999-01-01', TRUE) THEN 1 ELSE 0 END) AS BIGINT) AS v_ship,
    CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_price,
    CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT) AS v_pk
  FROM lineitem
),
ord_wide AS (
  SELECT count(*) AS n,
    CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_od,
    CAST(sum(CASE WHEN coalesce(o_totalprice <= 0, TRUE) THEN 1 ELSE 0 END) AS BIGINT) AS v_tp,
    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS v_pk
  FROM orders
),
fk AS (
  SELECT
    (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS li_ord_orphans,
    (SELECT CAST(count(*) AS BIGINT) FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS ord_cust_orphans,
    (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)) AS li_part_orphans
),
rows_out AS (
  SELECT 'li_quantity_positive' AS "constraint", n AS n_checked, v_qty AS n_violations FROM li_wide
  UNION ALL SELECT 'li_discount_in_0_1', n, v_disc FROM li_wide
  UNION ALL SELECT 'li_returnflag_in_set', n, v_rf FROM li_wide
  UNION ALL SELECT 'li_shipdate_in_range', n, v_ship FROM li_wide
  UNION ALL SELECT 'li_extendedprice_nonnull', n, v_price FROM li_wide
  UNION ALL SELECT 'ord_orderdate_nonnull', n, v_od FROM ord_wide
  UNION ALL SELECT 'ord_totalprice_positive', n, v_tp FROM ord_wide
  UNION ALL SELECT 'li_pk_unique', n, v_pk FROM li_wide
  UNION ALL SELECT 'ord_pk_unique', n, v_pk FROM ord_wide
  UNION ALL SELECT 'li_orderkey_fk', (SELECT n FROM li_wide), li_ord_orphans FROM fk
  UNION ALL SELECT 'ord_custkey_fk', (SELECT n FROM ord_wide), ord_cust_orphans FROM fk
  UNION ALL SELECT 'li_partkey_fk', (SELECT n FROM li_wide), li_part_orphans FROM fk
)
SELECT "constraint", CAST(n_checked AS BIGINT) AS n_checked,
       CAST(n_violations AS BIGINT) AS n_violations,
       n_violations = 0 AS ok
FROM rows_out
"""

register("dq_constraint_audit", q_dq_constraint_audit, _DQ_ORACLE)
