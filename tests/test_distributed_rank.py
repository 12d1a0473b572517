"""with_global_rank / with_ntile must be bit-identical to the
single-partition window functions they replace, for awkward sizes
(n % k != 0, n < k) and mixed asc/desc orders."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from dataframe_retail_e_inventarios_spark.operators.distributed_rank import (
    with_global_rank,
    with_ntile,
)


def _frame(spark, n):
    # values with collisions so the unique tiebreak (id) matters
    rows = [(i, (i * 7919) % 23, float((i * 31) % 11)) for i in range(n)]
    return spark.createDataFrame(rows, "id long, a long, b double").repartition(7)


@pytest.mark.parametrize("n", [1, 4, 5, 97, 1000])
def test_global_rank_matches_row_number(spark, n):
    df = _frame(spark, n)
    order = [F.col("a").asc(), F.col("b").desc(), F.col("id").asc()]
    got = {
        r["id"]: r["global_rank"]
        for r in with_global_rank(df, order, n_parts=5).collect()
    }
    w = Window.orderBy(*order)
    want = {
        r["id"]: r["rn"]
        for r in df.select("id", F.row_number().over(w).alias("rn")).collect()
    }
    assert got == want


@pytest.mark.parametrize("n,k", [(3, 5), (5, 5), (7, 5), (97, 5), (1000, 4), (1, 3)])
def test_ntile_matches_builtin(spark, n, k):
    df = _frame(spark, n)
    order = [F.col("a").desc(), F.col("id").asc()]
    got = {r["id"]: r["t"] for r in with_ntile(df, k, order, "t", n_parts=4).collect()}
    w = Window.orderBy(*order)
    want = {
        r["id"]: r["t"]
        for r in df.select("id", F.ntile(k).over(w).cast("long").alias("t")).collect()
    }
    assert got == want


def test_rank_plan_has_no_global_sort_of_data(spark):
    """The data-sized exchanges must be range/hash partitioned — no
    SinglePartition exchange on the ranked frame (the tiny offset
    table's window is the only sequential step and it never carries
    the data columns)."""
    df = _frame(spark, 500)
    out = with_global_rank(df, [F.col("a").asc(), F.col("id").asc()], n_parts=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            # the only single-partition exchange allowed is the tiny
            # (_dr_pid, _dr_cnt) count table feeding the offsets — its
            # immediate child must be that partial count aggregate,
            # never a data-carrying node
            child = lines[i + 1]
            assert "_dr_cnt" in child, child
    # and the data itself is range-partitioned, not globally sorted
    assert "rangepartitioning(a" in plan
