"""Checkpointed streaming restart: a file-sink query killed between
micro-batches and restarted from the same checkpoint must deliver
every input exactly once (no loss, no duplication). This is the
operational property a 100 TB ingest relies on — the sink's commit log
plus the source's offset log make the file sink end-to-end
exactly-once for append-mode queries."""

import shutil

import pyspark.sql.functions as F
import pytest

from dataframe_retail_e_inventarios_spark.sources.readers import load_table
from dataframe_retail_e_inventarios_spark.streaming.events import (
    EVENTS_STREAM_SCHEMA,
)
from tests.conftest import SF_SMOKE
from dataframe_retail_e_inventarios_spark.streaming.events import await_bounded


@pytest.fixture()
def split_source(spark, tmp_path):
    """Events split into two directories so the stream can be drained
    in two separate runs (the second run only sees new files)."""
    ev = load_table(spark, SF_SMOKE, "events")
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)
    src = str(tmp_path / "src")
    first.write.parquet(src)
    yield src, second, ev.count()
    shutil.rmtree(src, ignore_errors=True)


def _drain(spark, src, out, chk):
    stream = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(src)
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    await_bounded(q, 120)


def test_file_sink_exactly_once_across_restart(spark, tmp_path, split_source):
    src, second_half, total = split_source
    out = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")

    # Run 1: drain the first half, then the query stops (availableNow).
    _drain(spark, src, out, chk)
    n_first = spark.read.parquet(out).count()
    assert 0 < n_first < total

    # More files land in the source dir while the query is down.
    second_half.write.mode("append").parquet(src)

    # Run 2: restart from the SAME checkpoint — the offset log must
    # skip already-committed files and process only the new ones.
    _drain(spark, src, out, chk)

    got = spark.read.parquet(out)
    assert got.count() == total  # nothing lost, nothing doubled
    assert got.select("event_id").distinct().count() == total

    # Run 3: restart with NO new data — must be a no-op.
    _drain(spark, src, out, chk)
    assert spark.read.parquet(out).count() == total
