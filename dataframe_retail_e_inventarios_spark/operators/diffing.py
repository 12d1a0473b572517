"""Dataset snapshot diff [beyond-reference]: compare two versions of
a keyed dataset — the regression gate between corpus builds (did the
new pipeline run drop documents? silently rewrite half the payloads?).

Shape: one full-outer join on the key, change classification as a
projection, and an aggregate summary — one shuffle per side. The
changed-detection hash covers the compared columns only, so schema
additions don't flag every row."""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Per-row change status between two snapshots: 'added' (key only
    in new), 'removed' (only in old), 'changed' (key in both, any
    compared column differs — null-safe), 'unchanged'."""
    def row_hash(cols):
        # coalesce to a sentinel BEFORE concat: concat_ws silently
        # drops NULLs, which would make (NULL, 'x') collide with ('x').
        parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x01")) for c in cols]
        return F.md5(F.concat_ws("\x00", *parts))

    o = old.select(*keys, row_hash(compare_cols).alias("_oh"))
    n = new.select(*keys, row_hash(compare_cols).alias("_nh"))
    j = o.join(n, list(keys), "full_outer")
    status = (
        F.when(F.col("_oh").isNull(), "added")
        .when(F.col("_nh").isNull(), "removed")
        .when(F.col("_oh") != F.col("_nh"), "changed")
        .otherwise("unchanged")
    )
    return j.select(*keys, status.alias("status"))


def diff_summary(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Aggregate counts per change status (the number a CI gate
    thresholds on: e.g. fail the build if removed > 0.1%)."""
    return (
        snapshot_diff(old, new, keys, compare_cols)
        .groupBy("status")
        .agg(F.count("*").alias("n"))
    )
