"""Sketch-based quantiles: GK percentile_approx error must stay inside
its rank-error guarantee vs the exact percentile (same pattern as the
HLL relative-error test beside exact distinct counts). Since r9 the
registered query emits the rank-band booleans itself (r8 verdict #7 —
the guarantee is the driver-visible contract); this test asserts those
booleans AND independently re-derives the rank check on raw
percentile_approx values so a bug in the query's own band arithmetic
cannot vacuously pass."""

import pyspark.sql.functions as F

from dataframe_retail_e_inventarios_spark.plans.queries_scale import GK_ACCURACY
from dataframe_retail_e_inventarios_spark.registry import queries
from dataframe_retail_e_inventarios_spark.sources.readers import load_table
from tests.conftest import SF_CORRECT


def test_approx_quantiles_query_reports_in_band(spark):
    rows = queries()["approx_quantiles_events"](spark, SF_CORRECT).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.p50_in_band and r.p95_in_band and r.p99_in_band, r


def test_approx_quantiles_within_rank_error_independent(spark):
    ev = load_table(spark, SF_CORRECT, "events")
    sketch = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.percentile_approx("value", 0.5, GK_ACCURACY).alias("p50"),
            F.percentile_approx("value", 0.95, GK_ACCURACY).alias("p95"),
            F.percentile_approx("value", 0.99, GK_ACCURACY).alias("p99"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    vals = {
        et: sorted(
            r.value
            for r in ev.filter(F.col("event_type") == et).select("value").collect()
        )
        for et in sketch
    }
    for et, row in sketch.items():
        v = vals[et]
        n = len(v)
        assert row["n"] == n
        eps = n / GK_ACCURACY + 2.0
        for q, col in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
            x = row[col]
            lt = sum(1 for y in v if y < x)
            le = sum(1 for y in v if y <= x)
            target = q * n
            # rank interval [lt+1, le] intersects target ± eps
            assert lt + 1 <= target + eps and le >= target - eps, (
                et,
                col,
                x,
                lt,
                le,
                target,
            )


def test_approx_quantiles_band_survives_null_values(spark, tmp_path):
    """r9 ADVICE: percentile_approx and the lt/le rank sums ignore NULL
    values, so the audit's n must be the NON-NULL count — with a
    count(*) n the target rank q*n drifts off the true rank window the
    moment `value` carries NULLs. Nulls 25% of values in a copy of the
    events table and asserts every band boolean still holds (and n
    reports the non-null count)."""
    ev = load_table(spark, SF_CORRECT, "events")
    nulled = ev.withColumn(
        "value",
        F.when(F.pmod(F.xxhash64("event_id"), F.lit(4)) == 0, F.lit(None)).otherwise(
            F.col("value")
        ),
    )
    nulled.write.parquet(str(tmp_path / "events.parquet"))
    n_nonnull = nulled.filter(F.col("value").isNotNull()).count()
    assert 0 < n_nonnull < nulled.count()  # the injection actually fired
    rows = queries()["approx_quantiles_events"](spark, str(tmp_path)).collect()
    assert len(rows) > 0
    assert sum(r.n for r in rows) == n_nonnull
    for r in rows:
        assert r.p50_in_band and r.p95_in_band and r.p99_in_band, r
