"""Exclusive prefix sums over METADATA-SCALE frames, without a window.

distributed_rank and packing both end their distributed scan with an
exclusive prefix sum over one row per partition/block. An unpartitioned
``Window.orderBy`` computes that correctly — but WindowExec still logs
its single-partition warning (it cannot know the input is tiny), and a
registry-wide "no single-partition-window warning" invariant is worth
keeping absolute. This helper computes the same prefix sum as a
triangular broadcast join: for each key, sum the counts of all
STRICTLY SMALLER keys. O(b^2) pair rows for b blocks — b is bounded by
partition/block count (thousands at the extreme), never by data rows,
and the sums are exact BIGINTs, so the result is bit-identical to the
window form under any partitioning.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def exclusive_prefix_offsets(
    counts: DataFrame, key_col: str, cnt_col: str, out_col: str
) -> DataFrame:
    """(key_col, out_col) with out_col = sum of cnt_col over all rows
    whose key is strictly smaller — an exclusive prefix sum in key
    order. ``counts`` must be metadata-scale (one row per partition or
    block)."""
    prev = counts.select(
        F.col(key_col).alias("_pp_key"), F.col(cnt_col).alias("_pp_cnt")
    )
    return (
        counts.select(key_col)
        .join(F.broadcast(prev), F.col("_pp_key") < F.col(key_col), "left")
        .groupBy(key_col)
        .agg(F.coalesce(F.sum("_pp_cnt"), F.lit(0)).cast("long").alias(out_col))
    )


def exclusive_prefix_offsets_with_total(
    counts: DataFrame, key_col: str, cnt_col: str, out_col: str, total_col: str
) -> DataFrame:
    """(key_col, out_col, total_col): the exclusive prefix sum AND the
    grand total in ONE pass — a full broadcast pairing of the
    metadata-scale counts frame with itself, conditionally summed.
    Saves the separate total aggregate + crossJoin stage that
    ``with_global_rank(total_col=...)`` otherwise schedules (two extra
    AQE materializations per ranking; measured on rfm_segmentation)."""
    prev = counts.select(
        F.col(key_col).alias("_pp_key"), F.col(cnt_col).alias("_pp_cnt")
    )
    return (
        counts.select(key_col)
        .crossJoin(F.broadcast(prev))
        .groupBy(key_col)
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("_pp_key") < F.col(key_col), F.col("_pp_cnt"))),
                F.lit(0),
            )
            .cast("long")
            .alias(out_col),
            F.sum("_pp_cnt").cast("long").alias(total_col),
        )
    )
