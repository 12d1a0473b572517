"""Cross-operator consistency: independent implementations of related
temporal semantics must agree on the same data.

- SCD2 current versions vs CDC latest-state compaction: the SCD2
  history's is_current row per key must carry the same value the CDC
  merge keeps (for keys the CDC tombstone rule retains).
- PIT join vs the generic as-of operator: the point-in-time purchase
  enrichment must equal asof_join of purchases against the view
  stream.
"""

import pyspark.sql.functions as F

from dataframe_retail_e_inventarios_spark.functions.timewall import (
    wall_epoch_micros,
)
from dataframe_retail_e_inventarios_spark.operators.asof import asof_join
from dataframe_retail_e_inventarios_spark.plans.queries_warehouse import (
    q_pit_join_purchase_state,
    q_scd2_user_event_history,
)
from dataframe_retail_e_inventarios_spark.sources.readers import load_table

from conftest import SF_SMOKE


def test_scd2_current_matches_cdc_latest(spark):
    from dataframe_retail_e_inventarios_spark.registry import queries

    scd2_current = {
        (r.user_id, r.event_type): r.value
        for r in q_scd2_user_event_history(spark, SF_SMOKE)
        .filter("is_current")
        .collect()
    }
    cdc = {
        (r.user_id, r.event_type): r.value
        for r in queries()["cdc_latest_state"](spark, SF_SMOKE).collect()
    }
    # CDC drops tombstoned keys (latest value < 1.0); SCD2 keeps full
    # history. Every CDC-retained key must exist in SCD2 with the
    # same current value.
    assert cdc  # non-trivial
    for k, v in cdc.items():
        assert k in scd2_current
        assert scd2_current[k] == v
    # and the CDC-dropped keys are exactly the tombstoned currents
    dropped = set(scd2_current) - set(cdc)
    assert all(scd2_current[k] < 1.0 for k in dropped)


def test_pit_join_matches_asof_operator(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.col("event_id").alias("view_event_id"),
        F.col("value").alias("view_value"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    # micros*4 leaves room to order dim-before-probe at equal ts the
    # way the PIT window does (side ordering): dim at t sorts first.
    via_asof = asof_join(
        purchases,
        views,
        key_left="user_id",
        key_right="user_id",
        time_left=wall_epoch_micros(F.col("ts")) * 4 + 1,
        time_right=wall_epoch_micros(F.col("ts")) * 4,
        payload_cols=["view_event_id", "view_value"],
    ).filter(F.col("view_value").isNotNull())
    got = {
        r.event_id: (r.view_event_id, r.view_value)
        for r in via_asof.collect()
    }
    want = {
        r.purchase_event_id: (r.state_version_id, r.state_view_value)
        for r in q_pit_join_purchase_state(spark, SF_SMOKE).collect()
    }
    assert got == want
