"""Token-budget packing (operators/packing.py): distributed prefix sum
must equal the naive global scan, and the plan must never run a
data-sized single-partition window."""

import pyspark.sql.functions as F

from dataframe_retail_e_inventarios_spark.operators.packing import pack_into_batches


def test_packing_matches_naive_scan(spark):
    rows = [(i, (i * 37) % 100 + 1) for i in range(500)]
    docs = spark.createDataFrame(rows, "doc_id long, n long")
    got = {
        r.doc_id: (r.n_tokens, r.batch_id)
        for r in pack_into_batches(docs, F.col("n"), budget=256, block_size=64).collect()
    }
    cum = 0
    for i, n in rows:
        assert got[i] == (n, cum // 256), i
        cum += n


def test_packing_blocks_bound_the_sequential_step(spark):
    """Every data-sized window in the plan partitions by _block; the
    only unpartitioned window runs over the per-block totals."""
    docs = spark.createDataFrame(
        [(i, 10) for i in range(1000)], "doc_id long, n long"
    )
    df = pack_into_batches(docs, F.col("n"), budget=100, block_size=100)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # the block-partitioned running sum must exist...
    assert "_block" in plan
    # ...and batch ids must be contiguous from 0 (10 docs x 10 tokens
    # per batch -> 100 batches)
    n_batches = df.select("batch_id").distinct().count()
    assert n_batches == 100
