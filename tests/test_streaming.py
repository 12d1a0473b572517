"""Structured Streaming demo: the streaming hourly-count plan over a
file source must agree with the batch twin (queries_streaming)."""

import shutil

import pyspark.sql.functions as F
import pytest

from dataframe_retail_e_inventarios_spark.sources.readers import load_table
from dataframe_retail_e_inventarios_spark.streaming.events import (
    hourly_counts_stream,
    read_events_stream,
    run_stream_to_memory,
)
from tests.conftest import SF_SMOKE
from dataframe_retail_e_inventarios_spark.streaming.events import await_bounded


@pytest.fixture()
def events_dir(spark, tmp_path):
    # Re-write events as micro-precision parquet (the raw file is
    # nanos, unreadable by a stream source without the legacy conf).
    out = str(tmp_path / "events_stream")
    load_table(spark, SF_SMOKE, "events").write.parquet(out)
    yield out
    shutil.rmtree(out, ignore_errors=True)


def test_streaming_hourly_matches_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    assert stream.isStreaming
    counts = hourly_counts_stream(stream)
    run_stream_to_memory(spark, counts, "hourly_counts_test")
    got = (
        spark.table("hourly_counts_test")
        .select("hour_start", "event_type", "n")
        .toPandas()
        .sort_values(["hour_start", "event_type"], ignore_index=True)
    )
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy(
            F.date_trunc("hour", "ts").alias("hour_start"),
            "event_type",
        )
        .agg(F.count("*").alias("n"))
        .toPandas()
        .sort_values(["hour_start", "event_type"], ignore_index=True)
    )
    assert len(got) == len(batch) > 0
    assert (got["n"].to_numpy() == batch["n"].to_numpy()).all()


def test_sliding_stream_matches_batch_twin(spark, events_dir):
    """Sliding 1h/30min windows: streaming counts must equal the batch
    query (events_sliding_counts), which is itself oracle-checked."""
    from dataframe_retail_e_inventarios_spark.plans.queries_scale import (
        q_sliding_counts,
    )
    from dataframe_retail_e_inventarios_spark.streaming.events import (
        sliding_counts_stream,
    )

    stream = sliding_counts_stream(read_events_stream(spark, events_dir))
    run_stream_to_memory(spark, stream, "sliding_counts_test")
    got = (
        spark.table("sliding_counts_test")
        .select(
            F.floor(F.unix_micros("window_start") / 1_000_000)
            .cast("long")
            .alias("window_start_epoch"),
            "event_type",
            "n",
        )
        .toPandas()
        .sort_values(["window_start_epoch", "event_type"], ignore_index=True)
    )
    batch = (
        q_sliding_counts(spark, SF_SMOKE)
        .select("window_start_epoch", "event_type", "n")
        .toPandas()
        .sort_values(["window_start_epoch", "event_type"], ignore_index=True)
    )
    assert len(got) == len(batch) > 0
    assert (got["n"].to_numpy() == batch["n"].to_numpy()).all()
    assert (
        got["window_start_epoch"].to_numpy() == batch["window_start_epoch"].to_numpy()
    ).all()


def test_session_stream_plan_builds(spark, events_dir):
    from dataframe_retail_e_inventarios_spark.streaming.events import (
        user_sessions_stream,
    )

    sessions = user_sessions_stream(read_events_stream(spark, events_dir))
    run_stream_to_memory(spark, sessions, "sessions_test")
    out = spark.table("sessions_test").toPandas()
    assert len(out) > 0
    assert (out["n_events"] >= 1).all()


def test_stream_stream_join_matches_batch_twin(spark, events_dir):
    """Watermarked stream-stream conversion join must produce exactly
    the batch twin's pairs (events_view_purchase_join, oracle-checked)."""
    from dataframe_retail_e_inventarios_spark.plans.queries_streaming import (
        q_view_purchase_join,
    )
    from dataframe_retail_e_inventarios_spark.streaming.events import (
        view_purchase_join_stream,
    )

    src = read_events_stream(spark, events_dir)
    joined = view_purchase_join_stream(
        src.filter(F.col("event_type") == "view"),
        src.filter(F.col("event_type") == "purchase"),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("conversion_join_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    await_bounded(q, 120)
    got = spark.table("conversion_join_test").select("view_id", "purchase_id")
    batch = q_view_purchase_join(spark, SF_SMOKE).select("view_id", "purchase_id")
    assert got.count() == batch.count() > 0
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_streaming_dedup_drops_replays(spark, events_dir, tmp_path):
    """dropDuplicatesWithinWatermark: a source containing every event
    twice (a replayed batch) must come out with each event_id once."""
    from dataframe_retail_e_inventarios_spark.streaming.events import (
        dedup_events_stream,
    )

    doubled = str(tmp_path / "events_doubled")
    ev = load_table(spark, SF_SMOKE, "events")
    ev.union(ev).write.parquet(doubled)

    deduped = dedup_events_stream(read_events_stream(spark, doubled))
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    await_bounded(q, 120)
    got = spark.table("dedup_stream_test")
    n_distinct = ev.select("event_id").distinct().count()
    assert got.count() == n_distinct
    assert got.select("event_id").distinct().count() == n_distinct


def test_transformwithstate_matches_batch(spark, events_dir):
    """transformWithStateInPandas twin: same final per-user totals as
    the batch aggregate (and hence as the applyInPandasWithState twin).
    The API's state protocol needs google.protobuf, which this
    container lacks — skip-gated exactly like the Prophet dep (the
    applyInPandasWithState twin keeps the semantics covered)."""
    pytest.importorskip("google.protobuf.descriptor")
    from dataframe_retail_e_inventarios_spark.streaming.events import (
        running_user_totals_tws,
    )

    stream = running_user_totals_tws(read_events_stream(spark, events_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("user_totals_tws_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    await_bounded(q, 120)
    got = (
        spark.table("user_totals_tws_test")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
        .toPandas()
        .sort_values("user_id", ignore_index=True)
    )
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .toPandas()
        .sort_values("user_id", ignore_index=True)
    )
    assert (got["user_id"].to_numpy() == batch["user_id"].to_numpy()).all()
    assert (got["n_events"].to_numpy() == batch["n_events"].to_numpy()).all()


def test_stateful_running_totals(spark, events_dir):
    """applyInPandasWithState: final per-user totals equal the batch
    aggregate (single availableNow drain -> one update per user)."""
    from dataframe_retail_e_inventarios_spark.streaming.events import (
        read_events_stream,
        running_user_totals_stream,
    )

    stream = running_user_totals_stream(read_events_stream(spark, events_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("user_totals_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    await_bounded(q, 120)
    got = (
        spark.table("user_totals_test")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
        .toPandas()
        .sort_values("user_id", ignore_index=True)
    )
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .toPandas()
        .sort_values("user_id", ignore_index=True)
    )
    assert (got["user_id"].to_numpy() == batch["user_id"].to_numpy()).all()
    assert (got["n_events"].to_numpy() == batch["n_events"].to_numpy()).all()
