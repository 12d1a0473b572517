"""The five REGISTERED streaming queries (live availableNow drains
inside the correctness gate) re-checked in the suite against their
batch twins, so a regression shows up in pytest as well as in the
driver's oracle run."""

import pyspark.sql.functions as F

from dataframe_retail_e_inventarios_spark.registry import queries
from dataframe_retail_e_inventarios_spark.sources.readers import load_table

from conftest import SF_SMOKE


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_streaming_rollup_equals_batch_incremental(spark):
    qs = queries()
    got = _rows(
        qs["streaming_rollup_maintenance"](spark, SF_SMOKE),
        ["l_partkey", "ship_month", "n_rows", "sum_qty"],
    )
    want = _rows(
        qs["incremental_monthly_rollup"](spark, SF_SMOKE),
        ["l_partkey", "ship_month", "n_rows", "sum_qty"],
    )
    assert got == want


def test_streaming_cdc_equals_batch_cdc(spark):
    qs = queries()
    got = _rows(
        qs["streaming_cdc_upsert"](spark, SF_SMOKE),
        ["user_id", "event_type", "last_epoch", "value"],
    )
    want = _rows(
        qs["cdc_latest_state"](spark, SF_SMOKE),
        ["user_id", "event_type", "last_epoch", "value"],
    )
    assert got == want


def test_streaming_sessions_equal_batch_builtin(spark):
    qs = queries()
    got = _rows(
        qs["streaming_session_windows"](spark, SF_SMOKE),
        ["user_id", "start_epoch", "end_epoch", "n_events"],
    )
    want = _rows(
        qs["events_session_window_builtin"](spark, SF_SMOKE),
        ["user_id", "start_epoch", "end_epoch", "n_events"],
    )
    assert got == want


def test_streaming_dedup_replay_restores_source(spark):
    qs = queries()
    out = qs["streaming_dedup_replay"](spark, SF_SMOKE)
    ev = load_table(spark, SF_SMOKE, "events")
    assert out.count() == ev.count()
    assert out.select("event_id").distinct().count() == ev.count()


def test_streaming_join_equals_batch_join(spark):
    qs = queries()
    cols = ["user_id", "view_id", "purchase_id", "gap_s"]
    got = _rows(qs["streaming_view_purchase_join"](spark, SF_SMOKE), cols)
    want = _rows(qs["events_view_purchase_join"](spark, SF_SMOKE), cols)
    assert got == want
