"""foreachBatch + merge_changes integration: a streaming ingest
maintaining a compacted latest-state parquet table — the
copy-on-write upsert loop every changelog consumer runs (the
Delta-less MERGE INTO). Each micro-batch folds into the state via
operators/cdc.merge_changes; the final state must equal running the
same compaction over the whole changelog in one batch."""

import pyspark.sql.functions as F

from dataframe_retail_e_inventarios_spark.operators.cdc import merge_changes
from dataframe_retail_e_inventarios_spark.sources.readers import load_table
from dataframe_retail_e_inventarios_spark.streaming.events import (
    EVENTS_STREAM_SCHEMA,
)
from tests.conftest import SF_SMOKE
from dataframe_retail_e_inventarios_spark.streaming.events import await_bounded

KEYS = ("user_id", "event_type")
SEQ = ("ts", "event_id")


def _tombstone(col=None):
    return (col if col is not None else F.col("value")) < 1.0


def test_foreachbatch_upsert_matches_one_shot_compaction(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "src")
    ev.write.parquet(src)
    state_dir = str(tmp_path / "state")

    def upsert_batch(batch_df, batch_id):
        try:
            base = batch_df.sparkSession.read.parquet(state_dir)
        except Exception:
            base = batch_df.filter(F.lit(False))  # empty, same schema
        # drop_deleted=False: tombstones must STAY in the running state
        # or an out-of-order older version in a later batch would
        # resurrect its key (micro-batches arrive in file order, not
        # time order). Deletes are applied at read time below.
        merged = merge_changes(
            base, batch_df, keys=KEYS, seq_cols=SEQ, delete_pred=_tombstone(),
            drop_deleted=False,
        )
        # Collect-then-rewrite: the state table cannot be overwritten
        # while it is an input of the running plan. State size is
        # bounded by distinct keys, not the changelog, so this is the
        # standard small-state loop; at real scale the sink would be a
        # Delta/Iceberg MERGE instead.
        rows = merged.collect()
        batch_df.sparkSession.createDataFrame(
            rows, merged.schema
        ).write.mode("overwrite").parquet(state_dir)

    stream = spark.readStream.schema(EVENTS_STREAM_SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = (
        stream.writeStream.foreachBatch(upsert_batch)
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    await_bounded(q, 180)

    got = (
        spark.read.parquet(state_dir)
        .filter(~_tombstone())  # read-time delete filter
        .select("user_id", "event_type", "event_id")
        .toPandas()
        .sort_values(["user_id", "event_type"], ignore_index=True)
    )
    expect = (
        merge_changes(
            ev.filter(F.lit(False)), ev, keys=KEYS, seq_cols=SEQ,
            delete_pred=_tombstone(),
        )
        .select("user_id", "event_type", "event_id")
        .toPandas()
        .sort_values(["user_id", "event_type"], ignore_index=True)
    )
    assert len(got) == len(expect) > 0
    assert got.equals(expect)
