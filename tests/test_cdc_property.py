"""Seeded-batch property test for changelog compaction: folding a
random changelog batch-by-batch (out-of-order arrival, tombstones
retained) must equal the one-shot compaction AND a pandas reference —
the associativity the incremental CDC loop relies on."""

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from dataframe_retail_e_inventarios_spark.operators.cdc import merge_changes

RNG = np.random.default_rng(7)

N_OPS = 300
N_KEYS = 30
N_BATCHES = 4


def _changelog():
    return pd.DataFrame(
        {
            "k": RNG.integers(0, N_KEYS, N_OPS),
            "seq": RNG.integers(0, 20, N_OPS),  # collisions likely
            "op_id": np.arange(N_OPS),  # unique total-order tiebreak
            "value": RNG.random(N_OPS).round(3),
            "deleted": RNG.random(N_OPS) < 0.2,
            "batch": RNG.integers(0, N_BATCHES, N_OPS),  # arrival ≠ seq order
        }
    )


def _pandas_reference(ops: pd.DataFrame) -> set:
    latest = (
        ops.sort_values(["seq", "op_id"])
        .groupby("k", as_index=False)
        .tail(1)
    )
    survivors = latest[~latest["deleted"]]
    return set(zip(survivors["k"], survivors["op_id"]))


def test_incremental_fold_equals_oneshot_and_reference(spark):
    ops = _changelog()
    sdf = spark.createDataFrame(ops)
    empty = sdf.filter(F.lit(False)).drop("batch")

    # One-shot compaction over the whole changelog.
    oneshot = merge_changes(
        empty, sdf.drop("batch"), keys=("k",), seq_cols=("seq", "op_id"),
        delete_pred=F.col("deleted"),
    )
    got_oneshot = {(r["k"], r["op_id"]) for r in oneshot.collect()}

    # Incremental: fold batch by batch, tombstones RETAINED in state,
    # deletes applied only at read time.
    state = empty
    for b in range(N_BATCHES):
        batch = sdf.filter(F.col("batch") == b).drop("batch")
        state = merge_changes(
            state, batch, keys=("k",), seq_cols=("seq", "op_id"),
            delete_pred=F.col("deleted"), drop_deleted=False,
        ).localCheckpoint(eager=True)  # simulate persisted state table
    got_incremental = {
        (r["k"], r["op_id"]) for r in state.filter(~F.col("deleted")).collect()
    }

    expected = _pandas_reference(ops)
    assert got_oneshot == expected
    assert got_incremental == expected
