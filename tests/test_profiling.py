"""Profiling operators: null/distinct bookkeeping and histogram
clamping (operators/profiling.py)."""

from dataframe_retail_e_inventarios_spark.operators.profiling import (
    column_profile,
    column_profile_approx,
    fixed_width_histogram,
)


def test_column_profile_counts(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "a", None), (3, None, 2.5), (4, "b", 2.5)],
        "id long, s string, v double",
    )
    prof = {r["col_name"]: r for r in column_profile(df, ("s", "v")).collect()}
    assert prof["s"]["n_rows"] == 4
    assert prof["s"]["n_nulls"] == 1
    assert prof["s"]["n_distinct"] == 2  # nulls excluded, like count(DISTINCT)
    assert prof["s"]["min_s"] == "a" and prof["s"]["max_s"] == "b"
    assert prof["v"]["n_nulls"] == 1
    assert prof["v"]["n_distinct"] == 2
    assert prof["v"]["min_s"] == "1.5" and prof["v"]["max_s"] == "2.5"


def test_column_profile_single_scan(spark):
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    plan = (
        column_profile(df, ("id", "s"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("LocalTableScan") + plan.count("Scan ") <= 1


def test_column_profile_approx_bounds_vs_exact(spark):
    """The HLL profile's estimates sit within 3x the configured rsd of
    the exact twin on every column (nulls/min/max/rows are exact — only
    the cardinality is sketched)."""
    rows = [(i, f"s{i % 137}", float(i % 59) if i % 11 else None) for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, s string, v double")
    rsd = 0.05
    exact = {r["col_name"]: r for r in column_profile(df, ("id", "s", "v")).collect()}
    approx = {
        r["col_name"]: r
        for r in column_profile_approx(df, ("id", "s", "v"), rsd=rsd).collect()
    }
    for c in ("id", "s", "v"):
        e, a = exact[c], approx[c]
        assert a["n_rows"] == e["n_rows"]
        assert a["n_nulls"] == e["n_nulls"]
        assert a["min_s"] == e["min_s"] and a["max_s"] == e["max_s"]
        assert abs(a["n_distinct_approx"] - e["n_distinct"]) <= max(
            3 * rsd * e["n_distinct"], 2
        )


def test_column_profile_approx_no_expand(spark):
    """The point of the approx variant: no Catalyst multi-distinct
    Expand — the scan feeds a plain partial/final aggregate."""
    df = spark.createDataFrame([(1, "a", 2.0)], "id long, s string, v double")
    plan = (
        column_profile_approx(df, ("id", "s", "v"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" not in plan


def test_histogram_bins_and_clamping(spark):
    df = spark.createDataFrame(
        [(x,) for x in [-5.0, 0.0, 4.9, 5.0, 42.0, 99.9, 100.0, 250.0, None]],
        "v double",
    )
    rows = {r["bin"]: r for r in fixed_width_histogram(df, "v", 0.0, 100.0, 20).collect()}
    assert rows[0]["n"] == 3       # -5 (clamped), 0.0, 4.9
    assert rows[1]["n"] == 1       # 5.0
    assert rows[8]["n"] == 1       # 42.0
    assert rows[19]["n"] == 3      # 99.9, 100.0 (clamped), 250 (clamped)
    assert sum(r["n"] for r in rows.values()) == 8  # null dropped
    assert rows[8]["lo_edge"] == 40.0


def test_column_profile_split_matches_one_scan(spark):
    """The per-column light-scan profile (r10 verdict #3: single-
    distinct two-phase aggregates, no multi-distinct Expand) must be
    value-identical to the one-wide-scan stack shape — they are the
    same contract with different physical plans."""
    from dataframe_retail_e_inventarios_spark.operators.profiling import (
        column_profile_split,
    )

    rows = [(i, f"s{i % 37}", float(i % 13) if i % 7 else None) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, s string, v double")
    cols = ("id", "s", "v")
    one = sorted(map(tuple, column_profile(df, cols).collect()))
    split = sorted(map(tuple, column_profile_split(df, cols).collect()))
    assert one == split


def test_column_profile_split_plan_has_no_expand(spark):
    """The split shape's reason to exist: no Expand node anywhere
    (each scan carries exactly one distinct aggregate)."""
    from dataframe_retail_e_inventarios_spark.operators.profiling import (
        column_profile_split,
    )

    df = spark.createDataFrame([(1, "a", 2.0)], "id long, s string, v double")
    plan = (
        column_profile_split(df, ("id", "s", "v"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" not in plan
