"""Fuzzy entity matching with blocking [SURVEY §2.11 beyond-reference]:
the entity-resolution primitive (catalog dedup, vendor-name
reconciliation) — approximate string matching made tractable by
comparing only within blocks.

The scale shape is blocking-then-verify, the string cousin of
LSH-then-verify: a cheap deterministic key (here: the first token)
partitions the corpus; the quadratic edit-distance comparison runs
only inside blocks, turning O(n²) corpus-wide into Σ(block²). At
100 TB you'd run several complementary blocking passes (first token,
sorted-token prefix, name MinHash) and union the candidates — each
pass is this same operator with a different key expression.

All JVM-side: split_part for the key, levenshtein for the verify —
no Python in the pair loop.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def first_token_block(name: Column | str) -> Column:
    c = F.col(name) if isinstance(name, str) else name
    return F.split_part(c, F.lit(" "), F.lit(1))


def blocked_levenshtein_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_dist: int,
    block_key: Column | None = None,
) -> DataFrame:
    """Pairs (id_a < id_b) whose names are within ``max_dist`` edits,
    compared only inside ``block_key`` blocks (default: first token).

    Recall caveat by construction: a typo in the blocking token itself
    sends the record to another block — that's why production entity
    resolution unions several blocking passes."""
    key = block_key if block_key is not None else first_token_block(name_col)
    t = df.select(
        F.col(id_col).alias("eid"), F.col(name_col).alias("name"), key.alias("blk")
    )
    a, b = t.alias("a"), t.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk")) & (F.col("a.eid") < F.col("b.eid")),
        )
        .withColumn("lev", F.levenshtein(F.col("a.name"), F.col("b.name")).cast("long"))
        .filter(F.col("lev") <= max_dist)
        .select(
            F.col("a.eid").alias("id_a"),
            F.col("b.eid").alias("id_b"),
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            "lev",
        )
    )
