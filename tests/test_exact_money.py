"""Boundary test for functions/exact.exact_money_sum: when the exact
4dp sum ends in ...50, round(sum/1e4, 2) is engine-divergent (Spark
HALF_UPs the shortest decimal repr "x.xx5" while DuckDB rounds the
binary double sitting just below it) — the 1-cent mismatch that broke
volume_shipping_nation_pairs at sf0.01. exact_money_sum reronds to
cents where the half is exactly representable, so both engines agree
bit-for-bit."""

import duckdb
import pandas as pd
import pyspark.sql.functions as F

from dataframe_retail_e_inventarios_spark.functions.exact import (
    exact_money_sum,
    exact_money_sum_sql,
)


# 285207.0350 reproduced: rows of 4dp values whose sum lands exactly on
# a .xx50 boundary, plus assorted off-boundary sums.
_CASES = [
    [285207.035],                      # the live failure value
    [0.005],                           # tiny half
    [0.015],                           # half that rounds UP under half-even
    [1.0001, 2.0049],                  # sum 3.0050
    [10.3333, 0.0017],                 # sum 10.3350
    [7.1239],                          # off-boundary
    [123456.785, 0.25],                # sum ...%R off boundary
]


def test_exact_money_sum_matches_duckdb_at_boundaries(spark):
    rows = [(i, v) for i, vals in enumerate(_CASES) for v in vals]
    pdf = pd.DataFrame(rows, columns=["g", "v"])
    sdf = spark.createDataFrame(pdf)
    got = (
        sdf.groupBy("g")
        .agg(exact_money_sum(F.col("v"), 4).alias("s"))
        .toPandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", pdf)
    sql = exact_money_sum_sql("v", 4)
    exp = con.execute(
        f"SELECT g, {sql} AS s FROM t GROUP BY g ORDER BY g"
    ).fetchdf()
    # bitwise float equality — the driver comparator's standard
    assert got.s.to_numpy().tobytes() == exp.s.to_numpy().tobytes()
    # and the values are what half-even-to-cents says they should be
    assert got.s.tolist() == [285207.04, 0.0, 0.02, 3.0, 10.34, 7.12, 123457.04]


def test_naive_round_after_division_is_divergent():
    """Pin WHY exact_money_sum exists: the naive formulation really
    does differ between the engines on the live failure value."""
    s4 = 2852070350  # 285207.0350 scaled to 4dp integer
    con = duckdb.connect()
    duck = con.execute(f"SELECT round({s4} / 10000.0, 2)").fetchone()[0]
    # DuckDB rounds the binary double (285207.03499999997...) down;
    # Spark's round() HALF_UPs the shortest repr "285207.035" up.
    assert duck == 285207.03
    import decimal

    spark_style = float(
        decimal.Decimal(repr(s4 / 10000.0)).quantize(
            decimal.Decimal("0.01"), rounding=decimal.ROUND_HALF_UP
        )
    )
    assert spark_style == 285207.04
    assert duck != spark_style


def test_exact_money_sum_6dp_and_random_boundary_sweep(spark):
    """decimals=6 (the Q1 sum_charge path) plus a deterministic sweep
    of 200 groups whose exact sums are seeded to land on/near the
    half-cent boundary — all compared to DuckDB in one roundtrip."""
    import hashlib

    rows = []
    for g in range(200):
        h = int(hashlib.md5(f"money:{g}".encode()).hexdigest()[:12], 16)
        base = (h % 10**9) / 1e6            # 6dp value
        rows.append((g, round(base, 6)))
        # force ~half the groups onto an exact ...x5 boundary at the
        # 3rd decimal of the SUM by adding a complement element
        if g % 2 == 0:
            target = (int(base * 1e3) * 10 + 5) / 1e4  # ...5 at 4th 6dp pos
            rows.append((g, round(target - round(base, 6), 6)))
    pdf = pd.DataFrame(rows, columns=["g", "v"])
    sdf = spark.createDataFrame(pdf)
    got = (
        sdf.groupBy("g")
        .agg(exact_money_sum(F.col("v"), 6).alias("s"))
        .toPandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.execute(
        f"SELECT g, {exact_money_sum_sql('v', 6)} AS s FROM t GROUP BY g ORDER BY g"
    ).fetchdf()
    assert got.s.to_numpy().tobytes() == exp.s.to_numpy().tobytes()
    # and every result is an exact 2dp value
    assert all(abs(x * 100 - round(x * 100)) < 1e-9 for x in got.s)


def test_exact_money_sum_null_contract(spark):
    """r8 ADVICE: the 2^52 overflow guard must not fire on NULL sums.
    An empty relation under a global aggregate and an all-NULL group
    both yield sum=NULL; assert_true raises on a NULL condition, so the
    guard has to except NULL totals explicitly — the function's
    contract is to return NULL there, exactly like SUM itself."""
    # empty relation, global aggregate
    empty = spark.createDataFrame([], "v double")
    row = empty.agg(exact_money_sum(F.col("v"), 4).alias("s")).collect()[0]
    assert row.s is None
    # all-NULL group alongside a real group
    pdf = pd.DataFrame({"g": [1, 1, 2], "v": [None, None, 3.0050]})
    sdf = spark.createDataFrame(pdf)
    got = {
        r.g: r.s
        for r in sdf.groupBy("g").agg(exact_money_sum(F.col("v"), 4).alias("s")).collect()
    }
    assert got[1] is None
    assert got[2] == 3.0
