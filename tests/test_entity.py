"""Blocked fuzzy matching (operators/entity.py)."""

from dataframe_retail_e_inventarios_spark.operators.entity import (
    blocked_levenshtein_pairs,
)


def _pairs(spark, rows, max_dist=1):
    df = spark.createDataFrame(rows, "id long, name string")
    out = blocked_levenshtein_pairs(df, "id", "name", max_dist=max_dist).collect()
    return {(r["id_a"], r["id_b"]): r["lev"] for r in out}


def test_matches_within_block_and_distance(spark):
    got = _pairs(
        spark,
        [
            (1, "small bolt"),
            (2, "small bolts"),   # lev 1 from #1 -> match
            (3, "small gear"),    # lev 4 from #1 -> no match
            (4, "large bolt"),    # other block, never compared
        ],
    )
    assert got == {(1, 2): 1}


def test_identical_names_match_at_distance_zero(spark):
    got = _pairs(spark, [(1, "red widget"), (2, "red widget")])
    assert got == {(1, 2): 0}


def test_blocking_skips_cross_block_typos(spark):
    # Documented recall caveat: a typo in the BLOCKING token hides the
    # pair (that's why production unions several blocking passes).
    got = _pairs(spark, [(1, "small bolt"), (2, "smal bolt")])
    assert got == {}


def test_max_block_drops_degenerate_blocks_only(spark):
    rows = [(i, f"common token{i}") for i in range(1, 11)]  # block of 10
    rows += [(100, "rare bolt"), (101, "rare bolts")]       # block of 2
    df = spark.createDataFrame(rows, "id long, name string")
    out = blocked_levenshtein_pairs(df, "id", "name", max_dist=1, max_block=5)
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert got == {(100, 101)}  # the 10-wide block was capped away


def test_no_allpairs_join_in_plan(spark):
    df = spark.createDataFrame([(1, "a b")], "id long, name string")
    plan = (
        blocked_levenshtein_pairs(df, "id", "name", 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
