"""Bloom-filter membership for corpus-scale decontamination
[SURVEY §2.11 N2 extension].

The exact shingle-overlap join (queries_datacleaning.contamination_
pairs) shuffles the full corpus shingle index against the benchmark
index. When the benchmark side is small and the question is only
"does this doc touch the benchmark AT ALL", the scale-correct shape is
a Bloom filter: hash the benchmark shingles into a fixed bitmap ONCE,
broadcast the bitmap (a few KB), and probe each corpus shingle with
pure per-row arithmetic — zero shuffle on the corpus side, zero join.
False positives are the documented price (bounded by (1-e^{-kn/m})^k);
false negatives are impossible, which is the direction decontamination
cares about.

Hashes are md5-derived (seeded by prefix) like every other text hash
in this repo, so the DuckDB oracle reproduces the EXACT bitmap —
including its false positives — making even the approximate operator
fully hash-checkable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

M_BITS = 1 << 16  # 65,536-bit filter = 1024 words of 64 bits (8 KB)
K_HASHES = 3


def _position(key: Column, seed: int) -> Column:
    """Bit position in [0, M_BITS) for a key under one seeded hash:
    first 15 md5 hex chars (< 2^60, positive in a BIGINT) mod m.
    DuckDB twin: ('0x' || substr(md5(seed || ':' || key), 1, 15))::BIGINT % m."""
    h = F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string")))
    return F.pmod(F.conv(F.substring(h, 1, 15), 16, 10).cast("long"), F.lit(M_BITS))


def position_sql(key: str, seed: int) -> str:
    return (
        f"CAST(('0x' || substr(md5('{seed}:' || CAST({key} AS VARCHAR)), 1, 15)) AS BIGINT) % {M_BITS}"
    )


def bloom_build(keys: DataFrame, key_col: str) -> DataFrame:
    """One-row frame holding the filter as MAP<word_idx, word>: only
    non-zero 64-bit words are materialized, so the broadcast payload is
    min(set bits, m/64) entries. Built with one aggregation over the
    (small) benchmark key set."""
    positions = keys.select(
        F.explode(
            F.array(*[_position(F.col(key_col), s) for s in range(K_HASHES)])
        ).alias("pos")
    )
    words = positions.select(
        (F.col("pos") / 64).cast("long").alias("word_idx"),
        (F.col("pos") % 64).cast("int").alias("bit"),
    ).select(
        "word_idx",
        # 1 << bit as a column: bit_count-free construction via pow2
        # table would be ugly; shiftleft(lit, col) isn't in the Python
        # API, so go through expr once here (still codegen'd JVM-side).
        F.expr("shiftleft(CAST(1 AS BIGINT), bit)").alias("word_bit"),
    )
    return (
        words.groupBy("word_idx")
        .agg(F.bit_or("word_bit").alias("word"))
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("word_idx", "word")))
            ).alias("bloom_words")
        )
    )


def bloom_probe_any(shingles: Column, bloom_words: Column) -> Column:
    """True iff ANY element of the shingle array is (probably) in the
    filter: all K seeded bits set. Pure per-row arithmetic against the
    broadcast map — the corpus side never shuffles."""

    def bit_set(pos: Column) -> Column:
        word = F.coalesce(
            F.element_at(bloom_words, (pos / 64).cast("long")),
            F.lit(0).cast("long"),
        )
        return F.bit_get(word, (pos % 64).cast("int")) == 1

    def shingle_hit(s: Column) -> Column:
        hit = None
        for seed in range(K_HASHES):
            b = bit_set(_position(s, seed))
            hit = b if hit is None else (hit & b)
        return hit

    return F.exists(shingles, shingle_hit)
