"""Sketch-based quantiles: GK percentile_approx error must stay inside
its rank-error guarantee vs the exact percentile (same pattern as the
HLL relative-error test beside exact distinct counts)."""

import pyspark.sql.functions as F

from dataframe_retail_e_inventarios_spark.registry import queries
from dataframe_retail_e_inventarios_spark.sources.readers import load_table
from tests.conftest import SF_CORRECT

ACCURACY = 10000


def test_approx_quantiles_within_rank_error(spark):
    got = {
        r["event_type"]: r
        for r in queries()["approx_quantiles_events"](spark, SF_CORRECT).collect()
    }
    ev = load_table(spark, SF_CORRECT, "events")
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
            F.expr("percentile(value, 0.99)").alias("p99"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for et, row in got.items():
        n = exact[et]["n"]
        assert row["n"] == n
        # GK guarantee: returned element's rank is within n/ACCURACY of
        # the target rank. Translate to a value-tolerance by checking
        # the approx value sits between the exact quantiles at
        # q ± (1/ACCURACY + small slack).
        slack = 1.0 / ACCURACY + 2.0 / n
        for q, col in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
            lo, hi = (
                ev.filter(F.col("event_type") == et)
                .agg(
                    F.expr(f"percentile(value, {max(q - slack, 0.0)})"),
                    F.expr(f"percentile(value, {min(q + slack, 1.0)})"),
                )
                .first()
            )
            assert lo <= row[col] <= hi, (et, col, row[col], lo, hi)
