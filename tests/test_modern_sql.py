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
