"""Custom Python Data Source (sources/docgen.py): determinism,
partition planning, and filter-pushdown partition pruning."""

import pyspark.sql.functions as F
import pytest

from dataframe_retail_e_inventarios_spark.sources.docgen import (
    DocGenDataSource,
    DocGenReader,
    doc_text,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    # Runtime-settable SQL conf; also set in session.get_spark for
    # sessions built fresh.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(DocGenDataSource)


def _read(spark, **opts):
    r = spark.read.format("docgen")
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_reads_all_docs_deterministically(spark):
    df = _read(spark, numdocs=500, numpartitions=4)
    assert df.count() == 500
    assert df.schema.simpleString() == "struct<doc_id:bigint,text:string,lang:string>"
    a = df.orderBy("doc_id").limit(5).collect()
    b = _read(spark, numdocs=500, numpartitions=4).orderBy("doc_id").limit(5).collect()
    assert a == b
    assert a[3]["text"] == doc_text(3)  # executor gen == driver gen


def test_parallel_partitions(spark):
    df = _read(spark, numdocs=1000, numpartitions=8)
    assert df.rdd.getNumPartitions() == 8
    # no dupes / no gaps across partition boundaries
    assert df.select("doc_id").distinct().count() == 1000
    assert df.agg(F.min("doc_id"), F.max("doc_id")).first() == (0, 999)


def test_filter_pushdown_prunes_partitions(spark):
    """doc_id range predicates clamp the planned id range BEFORE
    partitioning: the filtered scan plans strictly fewer partitions
    AND returns exactly the right rows."""
    # Independent load() per plan: pushFilters mutates the reader
    # instance owned by its DataFrame (the documented API shape), so
    # a pruned child plan must not share a reader with the full scan.
    full_parts = _read(spark, numdocs=10_000, numpartitions=10).rdd.getNumPartitions()
    assert full_parts == 10
    filtered = _read(spark, numdocs=10_000, numpartitions=10).filter(
        F.col("doc_id") < 100
    )
    assert filtered.count() == 100
    assert filtered.rdd.getNumPartitions() == 1  # 9 of 10 pruned
    point = _read(spark, numdocs=10_000, numpartitions=10).filter(
        F.col("doc_id") == 4321
    )
    assert point.rdd.getNumPartitions() == 1
    assert point.first()["text"] == doc_text(4321)


def test_unsupported_filters_still_correct(spark):
    """A non-id filter isn't pushable — the reader must hand it back
    to Spark and results stay correct."""
    df = _read(spark, numdocs=400, numpartitions=4).filter(F.col("lang") == "es")
    assert df.count() == 100  # every 4th doc
    assert df.filter(F.col("doc_id") % 4 != 1).count() == 0


def test_stream_reader_drains_corpus_in_batches(spark, tmp_path):
    """Streaming form: micro-batches of `batchsize` ids drain the
    corpus exactly once into a memory sink under availableNow."""
    stream = (
        spark.readStream.format("docgen")
        .option("numdocs", "350")
        .option("batchsize", "100")
        .load()
    )
    assert stream.isStreaming
    # Continuous micro-batches (availableNow drains only ONE batch of
    # a simple stream reader); poll until the bounded corpus is fully
    # consumed, then stop.
    import time as _time

    q = (
        stream.writeStream.format("memory")
        .queryName("docgen_stream_test")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = _time.time() + 90
        while _time.time() < deadline:
            if spark.table("docgen_stream_test").count() >= 350:
                break
            _time.sleep(0.5)
    finally:
        q.stop()
    got = spark.table("docgen_stream_test")
    assert got.count() == 350
    assert got.select("doc_id").distinct().count() == 350
    row = got.filter(F.col("doc_id") == 42).first()
    assert row["text"] == doc_text(42)  # replayed gen == batch gen


def test_reader_range_clamp_unit():
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    r = DocGenReader({"numdocs": "1000", "numpartitions": "4"})
    leftover = list(
        r.pushFilters(
            [GreaterThanOrEqual(("doc_id",), 200), LessThan(("doc_id",), 300)]
        )
    )
    assert leftover == []
    parts = r.partitions()
    assert sum(p.hi - p.lo for p in parts) == 100
    assert min(p.lo for p in parts) == 200 and max(p.hi for p in parts) == 300
