"""Spark 4 SQL scripting (BEGIN ... END procedural blocks): control
flow, variables, and a scripted aggregation over a temp view — the
migration surface for warehouse stored-procedure workloads."""

import pyspark.sql.functions as F
import pytest

from dataframe_retail_e_inventarios_spark.sources.readers import load_table

from conftest import SF_SMOKE


@pytest.fixture(scope="module", autouse=True)
def scripting_on(spark):
    prev = spark.conf.get("spark.sql.scripting.enabled", "false")
    spark.conf.set("spark.sql.scripting.enabled", "true")
    yield
    spark.conf.set("spark.sql.scripting.enabled", prev)


def test_while_loop_and_variables(spark):
    out = spark.sql(
        """
        BEGIN
          DECLARE x INT DEFAULT 0;
          DECLARE total BIGINT DEFAULT 0;
          WHILE x < 5 DO
            SET x = x + 1;
            SET total = total + x;
          END WHILE;
          SELECT x AS final_x, total AS sum_1_to_5;
        END
        """
    ).collect()
    assert out[0].final_x == 5
    assert out[0].sum_1_to_5 == 15


def test_scripted_iterative_aggregation(spark):
    """A scripted doubling loop over real data: compute total quantity
    and double a reorder threshold until it exceeds the mean — the
    kind of imperative warehouse proc a migrating user ports as-is."""
    li = load_table(spark, SF_SMOKE, "lineitem")
    li.createOrReplaceTempView("li_script")
    out = spark.sql(
        """
        BEGIN
          DECLARE mean_qty DOUBLE;
          DECLARE threshold DOUBLE DEFAULT 1.0;
          DECLARE steps INT DEFAULT 0;
          SET mean_qty = (SELECT avg(l_quantity) FROM li_script);
          WHILE threshold <= mean_qty DO
            SET threshold = threshold * 2;
            SET steps = steps + 1;
          END WHILE;
          SELECT threshold, steps, mean_qty;
        END
        """
    ).collect()[0]
    assert out.threshold > out.mean_qty
    assert out.threshold / 2 <= out.mean_qty
    assert out.steps >= 1
