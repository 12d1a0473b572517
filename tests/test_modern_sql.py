"""Modern SQL surface (plans/queries_modern.py): recursive-CTE
simulation against a hand-rolled Python fold, VARIANT extraction
totals, and SQL-UDF plan inlining."""

import datetime

import pyspark.sql.functions as F

from dataframe_retail_e_inventarios_spark.plans.queries_modern import (
    q_events_props_variant,
    q_inventory_projection,
    q_sql_udf_bands,
)
from dataframe_retail_e_inventarios_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE
from tests.test_trend import _write_lineitem


def test_recursive_projection_matches_python_simulation(spark, tmp_path):
    # Varying demand, one product: simulate the policy in plain Python
    # and require the recursive CTE to land on the same end state.
    demands = [10.0, 30.0, 0.0, 25.0, 5.0, 40.0, 10.0, 0.0, 15.0, 20.0, 35.0, 10.0]
    base = datetime.datetime(2024, 1, 7)
    rows = [
        (t, 11, 1, 1, d, 100.0, 0.0, 0.0, "N", "O", base + datetime.timedelta(weeks=t))
        for t, d in enumerate(demands)
    ]
    _write_lineitem(spark, str(tmp_path), rows)

    avg = sum(demands) / len(demands)
    rop, oq = 2.0 * avg, 4.0 * avg
    on_hand, orders, stockouts = rop + oq, 0, 0
    for d in demands:
        avail = on_hand - d
        if avail < 0.0:
            stockouts += 1
        on_hand = max(avail, 0.0)
        if on_hand < rop:
            on_hand += oq
            orders += 1

    out = q_inventory_projection(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_weeks == len(demands)
    assert r.orders_placed == orders and r.stockout_weeks == stockouts
    assert abs(r.end_on_hand - on_hand) < 1e-4


def test_variant_extraction_covers_all_rows(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    total = ev.count()
    out = q_events_props_variant(spark, SF_SMOKE)
    agg = out.agg(F.sum("n").alias("n"), F.min("k_decile"), F.max("k_decile")).collect()[0]
    # Every event has a props.k in this corpus; deciles are k//10.
    assert agg[0] == total
    assert agg[1] >= 0 and agg[2] <= 10


def test_sql_udf_is_inlined_not_python(spark):
    df = q_sql_udf_bands(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # A SQL UDF never leaves the JVM: no Python evaluation operator in
    # the physical plan, and the banding CASE is codegen'd inline.
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    bands = {r.band for r in df.collect()}
    assert bands == {"none", "light", "deep"}


def test_session_window_exact_gap_boundary(spark, tmp_path):
    # Spark's session merge interval is CLOSED: an event at exactly
    # prev + gap still joins (probed on 4.1.2); one microsecond past
    # splits. The oracle's `>` comparison encodes the same rule.
    import datetime as dt

    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        (1, t0, 10, "view", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=30), 10, "view", 1.0, "{}"),  # exact gap: merges
        (3, t0 + dt.timedelta(hours=2), 10, "view", 1.0, "{}"),
        (4, t0 + dt.timedelta(hours=2, minutes=30, microseconds=1), 10, "view", 1.0, "{}"),  # 1us past: splits
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    from dataframe_retail_e_inventarios_spark.plans.queries_modern import (
        q_session_window_builtin,
    )

    out = q_session_window_builtin(spark, str(tmp_path)).collect()
    sizes = sorted(r.n_events for r in out)
    assert sizes == [1, 1, 2]


def test_range_frame_weights_dates_not_rows(spark, tmp_path):
    # Two sales 40 days apart: a 28-day RANGE frame must NOT include
    # the older day, even though it is the adjacent row.
    import datetime as dt

    rows = [
        (1, 5, 1, 1, 10.0, 100.0, 0.0, 0.0, "N", "O", dt.datetime(2024, 1, 1)),
        (2, 5, 1, 1, 7.0, 100.0, 0.0, 0.0, "N", "O", dt.datetime(2024, 2, 10)),
    ]
    from tests.test_trend import _write_lineitem

    _write_lineitem(spark, str(tmp_path), rows)
    from dataframe_retail_e_inventarios_spark.plans.queries_modern import (
        q_trailing_28d_range,
    )

    out = sorted(
        q_trailing_28d_range(spark, str(tmp_path)).collect(),
        key=lambda r: r.epoch_day,
    )
    assert [r.units_28d for r in out] == [10, 7]


def test_sql_pipe_is_plan_neutral(spark):
    """The |> pipe form must produce the same physical plan shape (and
    rows) as the classic form — the sugar parses into identical logical
    operators."""
    from dataframe_retail_e_inventarios_spark.plans.queries_modern import (
        q_sql_pipe_pricing,
    )
    from dataframe_retail_e_inventarios_spark.sources.readers import load_table
    from conftest import SF_SMOKE

    piped = q_sql_pipe_pricing(spark, SF_SMOKE)
    load_table(spark, SF_SMOKE, "lineitem").createOrReplaceTempView("_li_pipe")
    classic = spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
               sum(CAST(l_quantity AS BIGINT)) AS sum_qty,
               sum(CAST(bround(l_extendedprice * 100, 0) AS BIGINT)) / 1e2
                 AS sum_base_price,
               sum(CAST(bround(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) / 1e4
                 AS sum_disc_price
        FROM _li_pipe
        WHERE l_shipdate <= DATE'1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    )
    assert piped.collect() == classic.collect()
    p1 = piped._jdf.queryExecution().executedPlan().toString()
    p2 = classic._jdf.queryExecution().executedPlan().toString()
    for op in ("HashAggregate", "Exchange", "Sort"):
        assert p1.count(op) == p2.count(op), op
