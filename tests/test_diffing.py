"""Snapshot diff semantics (operators/diffing.py)."""

from dataframe_retail_e_inventarios_spark.operators.diffing import (
    diff_summary,
    snapshot_diff,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, a string, v double")


def test_all_four_statuses(spark):
    old = _df(spark, [(1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0)])
    new = _df(spark, [(2, "y", 2.0), (3, "z", 9.0), (4, "w", 4.0)])
    got = {
        r["k"]: r["status"]
        for r in snapshot_diff(old, new, ("k",), ("a", "v")).collect()
    }
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}
    counts = {
        r["status"]: r["n"]
        for r in diff_summary(old, new, ("k",), ("a", "v")).collect()
    }
    assert counts == {"removed": 1, "unchanged": 1, "changed": 1, "added": 1}


def test_null_vs_empty_string_distinguished(spark):
    old = _df(spark, [(1, None, 1.0)])
    new = _df(spark, [(1, "", 1.0)])
    got = snapshot_diff(old, new, ("k",), ("a", "v")).first()
    assert got["status"] == "changed"  # concat_ws would have collided


def test_uncompared_columns_ignored(spark):
    old = _df(spark, [(1, "x", 1.0)])
    new = _df(spark, [(1, "x", 999.0)])
    assert snapshot_diff(old, new, ("k",), ("a",)).first()["status"] == "unchanged"
