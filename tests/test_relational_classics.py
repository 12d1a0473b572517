"""Differential + plan tests for the round-7 classic join shapes
(TPC-H Q7/Q10/Q22 silhouettes in queries_relational.py)."""

import numpy as np
import pandas as pd

from dataframe_retail_e_inventarios_spark.registry import queries
from tests.conftest import SF_SMOKE


def _round_even(x, d=0):
    return np.round(np.asarray(x, dtype=float), d)


def test_volume_shipping_matches_pandas(spark):
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    cust = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    supp = pd.read_parquet(f"{SF_SMOKE}/supplier.parquet")
    nation = pd.read_parquet(f"{SF_SMOKE}/nation.parquet")
    li = li[li.l_shipdate.dt.year.between(1996, 1997)].copy()
    j = (
        li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(supp, left_on="l_suppkey", right_on="s_suppkey")
        .merge(
            nation.rename(columns={"n_name": "supp_nation"}),
            left_on="s_nationkey",
            right_on="n_nationkey",
        )
        .merge(
            nation.rename(columns={"n_name": "cust_nation"}),
            left_on="c_nationkey",
            right_on="n_nationkey",
            suffixes=("", "_c"),
        )
    )
    j = j[j.supp_nation != j.cust_nation].copy()
    j["l_year"] = j.l_shipdate.dt.year.astype("int64")
    j["rev_i"] = _round_even(
        j.l_extendedprice * (1 - j.l_discount) * 10000
    ).astype("int64")
    expect = (
        j.groupby(["supp_nation", "cust_nation", "l_year"])
        .agg(rev_i=("rev_i", "sum"), n_lines=("rev_i", "size"))
        .reset_index()
    )
    expect["revenue"] = (expect.rev_i / 1e4).round(2)
    got = (
        queries()["volume_shipping_nation_pairs"](spark, SF_SMOKE)
        .toPandas()
        .sort_values(["supp_nation", "cust_nation", "l_year"])
        .reset_index(drop=True)
    )
    expect = expect.sort_values(
        ["supp_nation", "cust_nation", "l_year"]
    ).reset_index(drop=True)
    assert len(got) == len(expect)
    assert (got.n_lines.to_numpy() == expect.n_lines.to_numpy()).all()
    assert np.allclose(got.revenue.to_numpy(), expect.revenue.to_numpy(), atol=1e-9)
    # a nation never ships to itself in this frame
    assert (got.supp_nation != got.cust_nation).all()


def test_volume_shipping_plan_broadcasts(spark):
    df = queries()["volume_shipping_nation_pairs"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # supplier + customer + both nation aliases broadcast; the only
    # SMJ-eligible join is lineitem<->orders.
    assert plan.count("BroadcastHashJoin") >= 4
    assert "ShuffledHashJoin" not in plan


def test_returned_item_losses_matches_pandas(spark):
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    cust = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    nation = pd.read_parquet(f"{SF_SMOKE}/nation.parquet")
    li = li[li.l_returnflag == "R"]
    orders = orders[orders.o_orderdate.dt.year == 1996]
    j = (
        li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    )
    j["rev_i"] = _round_even(
        j.l_extendedprice * (1 - j.l_discount) * 10000
    ).astype("int64")
    agg = (
        j.groupby(["c_custkey", "c_name", "n_name"])
        .agg(rev_i=("rev_i", "sum"), n_lines=("rev_i", "size"))
        .reset_index()
        .sort_values(["rev_i", "c_custkey"], ascending=[False, True])
        .head(20)
        .reset_index(drop=True)
    )
    got = queries()["returned_item_losses"](spark, SF_SMOKE).toPandas()
    assert len(got) == min(20, len(agg))
    assert got.c_custkey.tolist() == agg.c_custkey.tolist()
    assert got.n_lines.tolist() == agg.n_lines.tolist()
    assert np.allclose(
        got.lost_revenue.to_numpy(), (agg.rev_i / 1e4).round(2).to_numpy()
    )
    # ordering is by exact revenue desc
    assert (np.diff(got.lost_revenue.to_numpy()) <= 1e-9).all()


def test_returned_item_losses_uses_topk_not_global_sort(spark):
    df = queries()["returned_item_losses"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # the 'R' filter reaches the parquet scan
    assert "EqualTo(l_returnflag,R)" in plan


def test_global_sales_opportunity_matches_pandas(spark):
    cust = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    cents = _round_even(cust.c_acctbal * 100).astype("int64")
    pos = cents[cents > 0]
    total, n_pos = int(pos.sum()), int(len(pos))
    elig = cust[(cents * n_pos) > total].copy()
    elig["cents"] = cents[(cents * n_pos) > total]
    never = elig[~elig.c_custkey.isin(set(orders.o_custkey))]
    expect = (
        never.groupby("c_mktsegment")
        .agg(n_cust=("c_custkey", "size"), tc=("cents", "sum"))
        .reset_index()
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )
    got = (
        queries()["global_sales_opportunity"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )
    assert got.c_mktsegment.tolist() == expect.c_mktsegment.tolist()
    assert got.n_cust.tolist() == expect.n_cust.tolist()
    assert np.allclose(
        got.total_acctbal.to_numpy(), (expect.tc / 1e2).round(2).to_numpy()
    )
    # every reported customer is strictly above the positive-balance mean
    assert (never.cents * n_pos > total).all()
