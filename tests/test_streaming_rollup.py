"""foreachBatch + fold_rollup integration: a streaming ingest
maintaining a standing aggregate table — the materialized-view
maintenance loop (operators/incremental.py) driven by Structured
Streaming micro-batches. Whatever the micro-batch boundaries turn out
to be, the folded state must equal the one-shot rollup over the whole
fact — the associative-partials property that makes maintenance
schedule-invariant."""

import pyspark.sql.functions as F

from dataframe_retail_e_inventarios_spark.operators.incremental import (
    finalize_rollup,
    fold_rollup,
    rollup_partials,
)
from dataframe_retail_e_inventarios_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE
from dataframe_retail_e_inventarios_spark.streaming.events import await_bounded

KEYS = ("l_partkey", "ship_month")


def _fact_cols(df):
    month = (F.year("l_shipdate") * 100 + F.month("l_shipdate")).cast("long")
    return df.select("l_partkey", month.alias("ship_month"), "l_quantity")


def test_streamed_fold_matches_one_shot(spark, tmp_path):
    li = load_table(spark, SF_SMOKE, "lineitem")
    src = str(tmp_path / "src")
    # several files so the stream sees multiple micro-batches
    li.repartition(6).write.parquet(src)
    state_dir = str(tmp_path / "rollup")

    def fold_batch(batch_df, batch_id):
        delta = rollup_partials(_fact_cols(batch_df), KEYS, "l_quantity")
        try:
            base = batch_df.sparkSession.read.parquet(state_dir)
            merged = fold_rollup(base, delta, KEYS)
        except Exception:
            merged = delta
        out = str(tmp_path / f"rollup_new_{batch_id}")
        merged.write.mode("overwrite").parquet(out)
        # atomic-enough swap for the test; production would write to a
        # versioned dir + pointer flip
        import shutil

        shutil.rmtree(state_dir, ignore_errors=True)
        shutil.move(out, state_dir)

    stream = (
        spark.readStream.schema(li.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = stream.writeStream.foreachBatch(fold_batch).trigger(
        availableNow=True
    ).start()
    await_bounded(q, 120)

    got = sorted(
        tuple(r)
        for r in finalize_rollup(spark.read.parquet(state_dir)).collect()
    )
    want = sorted(
        tuple(r)
        for r in finalize_rollup(
            rollup_partials(_fact_cols(li), KEYS, "l_quantity")
        ).collect()
    )
    assert got == want
