"""merge_changes (changelog compaction): latest-wins, tombstones,
tie-breaking toward the change stream."""

import datetime as dt

import pyspark.sql.functions as F

from dataframe_retail_e_inventarios_spark.operators.cdc import merge_changes


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "k long, ts timestamp, seq long, v double, deleted boolean"
    )


TS = dt.datetime(2024, 1, 1, 12, 0, 0)
LATER = dt.datetime(2024, 1, 2, 12, 0, 0)


def _merge(spark, base_rows, change_rows):
    out = merge_changes(
        _df(spark, base_rows),
        _df(spark, change_rows),
        keys=("k",),
        seq_cols=("ts", "seq"),
        delete_pred=F.col("deleted"),
    )
    return {r["k"]: r for r in out.collect()}


def test_update_wins_and_insert(spark):
    state = _merge(
        spark,
        [(1, TS, 1, 10.0, False), (2, TS, 1, 20.0, False)],
        [(1, LATER, 2, 11.0, False), (3, LATER, 1, 30.0, False)],
    )
    assert state[1]["v"] == 11.0  # updated
    assert state[2]["v"] == 20.0  # untouched base row survives
    assert state[3]["v"] == 30.0  # pure insert


def test_tombstone_erases_key_even_over_newer_base_nothing(spark):
    state = _merge(
        spark,
        [(1, TS, 1, 10.0, False)],
        [(1, LATER, 2, 0.0, True)],
    )
    assert 1 not in state


def test_old_tombstone_does_not_resurrect(spark):
    # delete marker OLDER than the latest upsert: key must survive
    # with the upsert value (filtering tombstones before ranking would
    # get this wrong).
    state = _merge(
        spark,
        [(1, TS, 1, 0.0, True)],
        [(1, LATER, 2, 5.0, False)],
    )
    assert state[1]["v"] == 5.0


def test_equal_seq_ties_break_toward_changes(spark):
    state = _merge(
        spark,
        [(1, TS, 1, 10.0, False)],
        [(1, TS, 1, 99.0, False)],
    )
    assert state[1]["v"] == 99.0
