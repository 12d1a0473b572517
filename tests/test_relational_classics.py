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


def test_q6_pushdown_reaches_scan(spark):
    df = queries()["forecasted_discount_revenue"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    # the range predicates must be in the parquet pushdown, not a
    # post-scan Filter only
    pushed = plan.split("PushedFilters")[1][:400]
    assert "l_quantity" in pushed and "l_discount" in pushed


def test_q6_matches_pandas(spark):
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    m = (
        (li.l_shipdate.dt.year == 1997)
        & (li.l_discount >= 0.05)
        & (li.l_discount <= 0.07)
        & (li.l_quantity < 24)
    )
    sel = li[m]
    rev_i = _round_even(sel.l_extendedprice * sel.l_discount * 10000).astype("int64").sum()
    got = queries()["forecasted_discount_revenue"](spark, SF_SMOKE).toPandas().iloc[0]
    assert got.n_lines == int(m.sum())
    assert got.revenue_effect == rev_i / 1e4


def test_promo_share_matches_pandas(spark):
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    part = pd.read_parquet(f"{SF_SMOKE}/part.parquet")
    li = li[(li.l_shipdate.dt.year == 1997) & li.l_shipdate.dt.month.isin([6, 7, 8])]
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    di = _round_even(j.l_extendedprice * (1 - j.l_discount) * 10000).astype("int64")
    promo = int(di[j.p_type == "PROMO"].sum())
    total = int(di.sum())
    got = queries()["promo_revenue_share"](spark, SF_SMOKE).toPandas().iloc[0]
    assert got.n_lines == len(j)
    assert got.promo_revenue == promo / 1e4
    assert got.total_revenue == total / 1e4
    assert got.promo_share_pct == (100.0 * promo) / total
    assert 0.0 <= got.promo_share_pct <= 100.0


def test_q17_matches_pandas(spark):
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    qty_i = _round_even(li.l_quantity * 100).astype("int64")
    price_i = _round_even(li.l_extendedprice * 100).astype("int64")
    g = pd.DataFrame({"k": li.l_partkey, "q": qty_i, "p": price_i})
    per = g.groupby("k").agg(sumq=("q", "sum"), n=("q", "size"))
    jj = g.join(per, on="k")
    small = jj[5 * jj.q * jj.n < jj.sumq]
    got = queries()["small_quantity_avg_yearly"](spark, SF_SMOKE).toPandas().iloc[0]
    assert got.n_small_lines == len(small)
    assert got.avg_yearly == int(small.p.sum()) / 7e2


def test_q18_having_gate_runs_before_joins(spark):
    df = queries()["large_volume_customers"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the qty_i > 15000 filter must sit on the aggregate, upstream of
    # both joins (plan order: scan -> agg -> filter -> joins)
    assert "qty_i" in plan
    agg_pos = plan.rfind("HashAggregate")
    join_pos = plan.find("Join")
    assert join_pos != -1 and agg_pos > join_pos  # aggregate deeper than joins


def test_q18_matches_pandas(spark):
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    qty_i = _round_even(li.l_quantity * 100).astype("int64")
    per = pd.DataFrame({"k": li.l_orderkey, "q": qty_i}).groupby("k").q.sum()
    big = per[per > 15000]
    got = (
        queries()["large_volume_customers"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    assert len(got) == len(big)
    assert set(got.o_orderkey) == set(big.index)
    m = got.set_index("o_orderkey").total_qty
    assert all(m[k] == v / 1e2 for k, v in big.items())
    # every reported order belongs to the reported customer
    om = orders.set_index("o_orderkey").o_custkey
    assert (got.set_index("o_orderkey").c_custkey == om[got.o_orderkey].values).all()


def test_q19_matches_pandas(spark):
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    part = pd.read_parquet(f"{SF_SMOKE}/part.parquet")
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    band = (
        ((j.p_brand == "Brand#12") & j.p_size.between(1, 15) & j.l_quantity.between(1, 15))
        | ((j.p_brand == "Brand#23") & j.p_size.between(1, 25) & j.l_quantity.between(10, 25))
        | ((j.p_brand == "Brand#34") & j.p_size.between(1, 35) & j.l_quantity.between(20, 35))
    )
    sel = j[band]
    rev_i = _round_even(sel.l_extendedprice * (1 - sel.l_discount) * 10000).astype("int64").sum()
    got = queries()["brand_size_band_revenue"](spark, SF_SMOKE).toPandas().iloc[0]
    assert got.n_lines == len(sel)
    assert got.revenue == rev_i / 1e4


def test_shipping_priority_matches_pandas(spark):
    """Q3 silhouette: pandas replay of the segment + two-sided date
    filter + per-order revenue top-10."""
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    cust = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    cutoff = pd.Timestamp("1998-07-01")
    li = li[li.l_shipdate.dt.normalize() > cutoff]
    orders = orders[orders.o_orderdate.dt.normalize() < cutoff]
    cust = cust[cust.c_mktsegment == "BUILDING"]
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey").merge(
        cust, left_on="o_custkey", right_on="c_custkey"
    )
    j["rev_i"] = _round_even(
        j.l_extendedprice * (1 - j.l_discount) * 10000
    ).astype("int64")
    agg = (
        j.groupby(["l_orderkey", "o_orderdate", "o_orderpriority"])
        .agg(rev_i=("rev_i", "sum"), n_lines=("rev_i", "size"))
        .reset_index()
        .sort_values(["rev_i", "l_orderkey"], ascending=[False, True])
        .head(10)
    )
    got = queries()["shipping_priority_topk"](spark, SF_SMOKE).toPandas()
    assert list(got.orderkey) == list(agg.l_orderkey)
    assert np.allclose(
        got.revenue.to_numpy(),
        _round_even(agg.rev_i / 1e2) / 1e2,
        atol=1e-9,
    )
    assert (got.n_lines.to_numpy() == agg.n_lines.to_numpy()).all()


def test_shipping_priority_plan_is_topk_with_broadcasts(spark):
    plan = (
        queries()["shipping_priority_topk"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan or "TakeOrderedAndProject" in plan


def test_local_supplier_volume_matches_pandas(spark):
    """Q5 silhouette: same-nation customer/supplier revenue, one
    region, one year."""
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    cust = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    supp = pd.read_parquet(f"{SF_SMOKE}/supplier.parquet")
    nation = pd.read_parquet(f"{SF_SMOKE}/nation.parquet")
    region = pd.read_parquet(f"{SF_SMOKE}/region.parquet")
    orders = orders[orders.o_orderdate.dt.year == 1996]
    j = (
        li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    )
    j = j[j.c_nationkey == j.s_nationkey]
    nr = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    nr = nr[nr.r_name == "ASIA"]
    j = j.merge(nr[["n_nationkey", "n_name"]], left_on="s_nationkey", right_on="n_nationkey")
    j["rev_i"] = _round_even(
        j.l_extendedprice * (1 - j.l_discount) * 10000
    ).astype("int64")
    expect = (
        j.groupby("n_name")
        .agg(rev_i=("rev_i", "sum"), n_lines=("rev_i", "size"))
        .reset_index()
        .sort_values("n_name")
    )
    got = (
        queries()["local_supplier_volume"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    assert list(got.n_name) == list(expect.n_name)
    assert (got.n_lines.to_numpy() == expect.n_lines.to_numpy()).all()
    assert np.allclose(
        got.revenue.to_numpy(),
        _round_even(expect.rev_i / 1e2) / 1e2,
        atol=1e-9,
    )


def test_nation_market_share_matches_pandas(spark):
    """Q8 silhouette: conditional/total exact sums, one BIGINT/BIGINT
    division for the share."""
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    part = pd.read_parquet(f"{SF_SMOKE}/part.parquet")
    cust = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    supp = pd.read_parquet(f"{SF_SMOKE}/supplier.parquet")
    nation = pd.read_parquet(f"{SF_SMOKE}/nation.parquet")
    region = pd.read_parquet(f"{SF_SMOKE}/region.parquet")
    orders = orders[orders.o_orderdate.dt.year.between(1996, 1997)].copy()
    orders["o_year"] = orders.o_orderdate.dt.year.astype("int64")
    part = part[part.p_type == "ECONOMY"]
    nr = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    am = nr[nr.r_name == "AMERICA"][["n_nationkey"]]
    j = (
        li.merge(part[["p_partkey"]], left_on="l_partkey", right_on="p_partkey")
        .merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(am, left_on="c_nationkey", right_on="n_nationkey")
        .merge(supp, left_on="l_suppkey", right_on="s_suppkey")
        .merge(
            nation.rename(columns={"n_name": "supp_nation"})[
                ["n_nationkey", "supp_nation"]
            ],
            left_on="s_nationkey",
            right_on="n_nationkey",
        )
    )
    j["rev_i"] = _round_even(
        j.l_extendedprice * (1 - j.l_discount) * 10000
    ).astype("int64")
    j["nat_i"] = np.where(j.supp_nation == "NATION_3", j.rev_i, 0)
    expect = (
        j.groupby("o_year")
        .agg(nat=("nat_i", "sum"), tot=("rev_i", "sum"))
        .reset_index()
        .sort_values("o_year")
    )
    got = (
        queries()["nation_market_share"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("o_year")
        .reset_index(drop=True)
    )
    assert list(got.o_year) == list(expect.o_year)
    assert np.allclose(
        got.mkt_share.to_numpy(), (expect.nat / expect.tot).to_numpy(), atol=0
    )


def test_top_supplier_quarter_matches_pandas(spark):
    """Q15 silhouette: max-revenue supplier(s) with exact-integer tie
    semantics."""
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    supp = pd.read_parquet(f"{SF_SMOKE}/supplier.parquet")
    d = li.l_shipdate.dt.normalize()
    li = li[(d >= pd.Timestamp("1996-01-01")) & (d < pd.Timestamp("1996-04-01"))].copy()
    li["rev_i"] = _round_even(
        li.l_extendedprice * (1 - li.l_discount) * 10000
    ).astype("int64")
    per = li.groupby("l_suppkey").rev_i.sum()
    winners = set(per[per == per.max()].index)
    got = queries()["top_supplier_quarter"](spark, SF_SMOKE).toPandas()
    assert set(got.suppkey) == winners
    assert np.allclose(
        got.total_revenue.to_numpy(),
        np.full(len(got), _round_even(per.max() / 1e2) / 1e2),
        atol=1e-9,
    )
    names = supp.set_index("s_suppkey").s_name
    assert all(names[k] == n for k, n in zip(got.suppkey, got.s_name))


def test_waiting_supplier_count_matches_pandas(spark):
    """Q21 silhouette replay: independent pandas derivation of the
    exists/not-exists qualification — per-(order,supplier) late-line
    rollup, order-level supplier counts, only-late-supplier filter."""
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    supp = pd.read_parquet(f"{SF_SMOKE}/supplier.parquet")
    nation = pd.read_parquet(f"{SF_SMOKE}/nation.parquet")
    o = orders[orders.o_orderstatus == "F"][["o_orderkey", "o_orderdate"]]
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j["late"] = (
        (j.l_shipdate.dt.normalize() - j.o_orderdate.dt.normalize()).dt.days > 90
    ).astype("int64")
    pso = (
        j.groupby(["l_orderkey", "l_suppkey"])
        .agg(n_late_lines=("late", "sum"))
        .reset_index()
    )
    per_order = pso.groupby("l_orderkey").agg(
        n_supps=("l_suppkey", "size"),
        n_late_supps=("n_late_lines", lambda s: int((s > 0).sum())),
    )
    q = pso.merge(per_order, on="l_orderkey")
    q = q[(q.n_late_lines > 0) & (q.n_supps >= 2) & (q.n_late_supps == 1)]
    numwait = (
        q.groupby("l_suppkey").n_late_lines.sum().rename("numwait").reset_index()
    )
    expect = (
        numwait.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
        .merge(nation, left_on="s_nationkey", right_on="n_nationkey")
        .sort_values(["numwait", "s_name"], ascending=[False, True])
        .head(100)[["s_name", "n_name", "numwait"]]
        .reset_index(drop=True)
    )
    got = queries()["waiting_supplier_count"](spark, SF_SMOKE).toPandas()
    assert len(got) == len(expect)
    assert got.s_name.tolist() == expect.s_name.tolist()
    assert got.numwait.astype("int64").tolist() == expect.numwait.astype("int64").tolist()


def test_dominant_supplier_parts_matches_pandas(spark):
    """Q20 silhouette replay: per-(part,supplier) 1996 '%gear%'
    quantities, contested-part gate (>=4 suppliers), dominance
    2*q > total, distinct supplier semi-join."""
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    part = pd.read_parquet(f"{SF_SMOKE}/part.parquet")
    supp = pd.read_parquet(f"{SF_SMOKE}/supplier.parquet")
    gear = part[part.p_name.str.contains("gear")][["p_partkey"]]
    j = li[li.l_shipdate.dt.year == 1996].merge(
        gear, left_on="l_partkey", right_on="p_partkey"
    )
    j["qty_i"] = _round_even(j.l_quantity * 100).astype("int64")
    ps = (
        j.groupby(["l_partkey", "l_suppkey"]).agg(q_i=("qty_i", "sum")).reset_index()
    )
    pt = ps.groupby("l_partkey").agg(
        tot_i=("q_i", "sum"), n_supps=("l_suppkey", "size")
    )
    d = ps.merge(pt, on="l_partkey")
    winners = set(d[(d.n_supps >= 4) & (2 * d.q_i > d.tot_i)].l_suppkey)
    expect = (
        supp[supp.s_suppkey.isin(winners)]
        .sort_values("s_suppkey")[["s_suppkey", "s_name", "s_acctbal"]]
        .reset_index(drop=True)
    )
    got = queries()["dominant_supplier_parts"](spark, SF_SMOKE).toPandas()
    assert got.s_suppkey.tolist() == expect.s_suppkey.tolist()
    assert np.allclose(got.s_acctbal.to_numpy(), expect.s_acctbal.to_numpy())


def test_product_type_profit_matches_pandas(spark):
    """Q9 silhouette replay: profit with the cost_ratio*retailprice
    proxy, one part family, grouped by supplier nation and year."""
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    part = pd.read_parquet(f"{SF_SMOKE}/part.parquet")
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    supp = pd.read_parquet(f"{SF_SMOKE}/supplier.parquet")
    nation = pd.read_parquet(f"{SF_SMOKE}/nation.parquet")
    fam = part[part.p_name.str.contains("widget")][["p_partkey", "p_retailprice"]]
    j = (
        li.merge(fam, left_on="l_partkey", right_on="p_partkey")
        .merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .merge(supp, left_on="l_suppkey", right_on="s_suppkey")
        .merge(nation, left_on="s_nationkey", right_on="n_nationkey")
    )
    j["o_year"] = j.o_orderdate.dt.year.astype("int64")
    j["profit_i"] = _round_even(
        (j.l_extendedprice * (1 - j.l_discount) - 0.6 * j.p_retailprice * j.l_quantity)
        * 10000
    ).astype("int64")
    expect = (
        j.groupby(["n_name", "o_year"])
        .agg(profit_i=("profit_i", "sum"), n_lines=("profit_i", "size"))
        .reset_index()
        .rename(columns={"n_name": "nation"})
        .sort_values(["nation", "o_year"])
        .reset_index(drop=True)
    )
    got = (
        queries()["product_type_profit"](spark, SF_SMOKE)
        .toPandas()
        .sort_values(["nation", "o_year"])
        .reset_index(drop=True)
    )
    assert len(got) == len(expect)
    assert got.n_lines.tolist() == expect.n_lines.tolist()
    assert np.allclose(
        got.profit.to_numpy(), (expect.profit_i / 1e4).to_numpy(), atol=1e-9
    )
