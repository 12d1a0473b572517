"""Physical-layout machinery: partition pruning, salted joins,
bucketed shuffle-free joins — asserted on plans and results."""

import pyspark.sql.functions as F
import pytest

from dataframe_retail_e_inventarios_spark.operators.partitioning import (
    read_time_partitioned,
    salted_join,
    write_bucketed_table,
    write_time_partitioned,
)
from dataframe_retail_e_inventarios_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


def test_partition_pruning(spark, tmp_path):
    li = load_table(spark, SF_SMOKE, "lineitem")
    path = str(tmp_path / "li_part")
    write_time_partitioned(li, path, "l_shipdate", "year")
    back = read_time_partitioned(spark, path)

    q = back.filter(F.col("_part") == "1998-01-01")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_part" in plan.split("PartitionFilters")[1][:200]
    # Pruned scan reads only the one year's rows.
    expected = li.filter(F.year("l_shipdate") == 1998).count()
    assert q.count() == expected > 0


def test_salted_join_matches_plain_join(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    plain = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .agg(F.count("*"), F.sum("l_quantity"))
        .collect()[0]
    )
    salted = (
        salted_join(li, orders.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey")
        .agg(F.count("*"), F.sum("l_quantity"))
        .collect()[0]
    )
    assert plain[0] == salted[0]
    assert abs(plain[1] - salted[1]) < 1e-6


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # warehouse.dir is static config; tables land in ./spark-warehouse
    # (gitignored) and are dropped in the finally block.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
        orders = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
        write_bucketed_table(li, "li_b", ["l_orderkey"], 8)
        write_bucketed_table(
            orders.withColumnRenamed("o_orderkey", "l_orderkey"), "ord_b", ["l_orderkey"], 8
        )
        j = spark.table("li_b").join(spark.table("ord_b"), "l_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")
