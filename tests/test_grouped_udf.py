"""GROUPED_AGG pandas UDF (functions/udafs.sum_scaled_log): the UDF
aggregate must equal the all-native expression twin bit-for-bit (both
use the scaled-BIGINT log discipline), and must be invariant to
partitioning (Arrow batch boundaries)."""

import pyspark.sql.functions as F

from dataframe_retail_e_inventarios_spark.functions.udafs import sum_scaled_log_udf
from dataframe_retail_e_inventarios_spark.sources.readers import load_table

from conftest import SF_SMOKE


def _native_slog(col):
    return F.sum(F.round(F.log(col) * 1e6, 0).cast("long"))


def test_udf_equals_native_twin(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").filter(F.col("l_quantity") > 0)
    got = {
        r.l_returnflag: r.slog
        for r in li.groupBy("l_returnflag")
        .agg(sum_scaled_log_udf()("l_quantity").alias("slog"))
        .collect()
    }
    want = {
        r.l_returnflag: r.slog
        for r in li.groupBy("l_returnflag")
        .agg(_native_slog(F.col("l_quantity")).alias("slog"))
        .collect()
    }
    assert got == want


def test_udf_partitioning_invariant(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").filter(F.col("l_quantity") > 0)
    one = {
        r.l_returnflag: r.slog
        for r in li.coalesce(1)
        .groupBy("l_returnflag")
        .agg(sum_scaled_log_udf()("l_quantity").alias("slog"))
        .collect()
    }
    many = {
        r.l_returnflag: r.slog
        for r in li.repartition(16)
        .groupBy("l_returnflag")
        .agg(sum_scaled_log_udf()("l_quantity").alias("slog"))
        .collect()
    }
    assert one == many
