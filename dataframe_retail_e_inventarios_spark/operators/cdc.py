"""Changelog compaction / merge-upsert [SURVEY §2.11 beyond-reference;
the reference engine has no mutation story, but any pipeline feeding a
training corpus from an operational source consumes a change stream].

``merge_changes`` is the copy-on-write MERGE shape (Delta/Hudi/Iceberg
compaction) expressed in pure DataFrame ops:

    base ∪ changes → one shuffle on the merge keys → keep latest row
    per key → drop delete tombstones.

Scale notes:
- exactly ONE shuffle (the window partitioning on the keys); the union
  itself is a no-shuffle plan concatenation;
- latest-wins is a per-key ``row_number`` — map-side nothing, but AQE
  splits skewed keys, and the state per key during the sort is one
  in-flight partition, never the whole changelog;
- delete markers are filtered AFTER the rank so a tombstone newer than
  every upsert correctly erases the key (filtering before the rank
  would resurrect the previous version).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def merge_changes(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    seq_cols: Sequence[str],
    delete_pred: Column,
    drop_deleted: bool = True,
) -> DataFrame:
    """Latest-wins upsert of ``changes`` into ``base``.

    ``seq_cols`` orders versions of a key (e.g. ``(ts, event_id)``);
    ties break toward ``changes``. Rows whose winning version satisfies
    ``delete_pred`` are tombstones: with ``drop_deleted`` the key
    disappears entirely (one-shot compaction).

    ``drop_deleted=False`` RETAINS the winning tombstone row — required
    when folding a changelog incrementally (foreachBatch loops): a
    dropped tombstone loses its sequence position, so an out-of-order
    older version arriving in a later batch would resurrect the key.
    Keep tombstones in the running state; filter ``delete_pred`` only
    at read time (exactly why Kafka/Delta compaction retains tombstones
    until a horizon passes).
    """
    tagged = base.withColumn("_src", F.lit(0)).unionByName(
        changes.withColumn("_src", F.lit(1))
    )
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in seq_cols], F.col("_src").desc()
    )
    latest = tagged.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    latest = latest.drop("_rn", "_src")
    return latest.filter(~delete_pred) if drop_deleted else latest
