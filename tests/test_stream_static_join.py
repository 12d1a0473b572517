"""Stream-static join: a streaming fact enriched against a static
dimension — the standard streaming-ETL enrichment shape (the static
side is re-read per micro-batch; broadcast-sized dims stay broadcast).
The streamed result must equal the batch join twin."""

import shutil

import pyspark.sql.functions as F
import pytest

from dataframe_retail_e_inventarios_spark.sources.readers import load_table
from dataframe_retail_e_inventarios_spark.streaming.events import (
    read_events_stream,
    run_stream_to_memory,
)
from tests.conftest import SF_SMOKE


@pytest.fixture()
def events_dir(spark, tmp_path):
    out = str(tmp_path / "events_src")
    load_table(spark, SF_SMOKE, "events").write.parquet(out)
    yield out
    shutil.rmtree(out, ignore_errors=True)


def _user_dim(spark):
    """Static per-user dimension derived from the same fixture:
    deterministic user tier by id hash — dimension-shaped, broadcast-
    sized."""
    ev = load_table(spark, SF_SMOKE, "events")
    return ev.select("user_id").distinct().select(
        "user_id",
        F.when(F.col("user_id") % 3 == 0, "gold")
        .when(F.col("user_id") % 3 == 1, "silver")
        .otherwise("bronze")
        .alias("tier"),
    )


def test_stream_static_enrichment_matches_batch(spark, events_dir):
    dim = _user_dim(spark)
    stream = read_events_stream(spark, events_dir)
    enriched = (
        stream.join(F.broadcast(dim), "user_id")
        .groupBy("tier", "event_type")
        .agg(F.count("*").alias("n"))
    )
    assert enriched.isStreaming
    run_stream_to_memory(spark, enriched, "tier_counts_test")
    got = {
        (r.tier, r.event_type): r.n
        for r in spark.table("tier_counts_test").collect()
    }
    want = {
        (r.tier, r.event_type): r.n
        for r in load_table(spark, SF_SMOKE, "events")
        .join(dim, "user_id")
        .groupBy("tier", "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want
    assert len(got) == 15  # 3 tiers x 5 event types
