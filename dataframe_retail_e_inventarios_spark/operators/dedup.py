"""Deduplication operators [SURVEY §2.11 N1-N2]: exact, n-gram Jaccard,
MinHash+LSH, SimHash.

Scale posture:
- Exact dedup is a hash group-by — one shuffle on the text hash, never
  on the text itself (group by md5, not by a multi-KB string).
- Jaccard/MinHash avoid the O(n^2) all-pairs join: candidates come
  from an inverted shingle (or LSH band) index — join on
  shingle/band key, which at 100 TB is the only tractable shape.
- All hashing is md5-hex-string based so DuckDB oracles reproduce the
  exact signatures (engine-portable; a prod deployment would swap in
  xxhash64 for speed, semantics unchanged).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .textops import fingerprint, tokens, word_shingles


def exact_dedup_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups keyed by normalized-text fingerprint:
    keep-first (min id) + duplicate count [N1]."""
    return (
        docs.withColumn("fp", fingerprint(text_col))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_dups"),
        )
    )


def doc_shingles(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(doc_id, shingle) exploded inverted-index input.

    Tokenization is materialized in its own projection BEFORE the
    shingle transform: the shingle lambda references the token array
    ~3x per shingle, and Catalyst will not common-subexpression-
    eliminate an expensive regex split into a lambda — inlining it
    re-splits the text per element_at (measured 10x slowdown).
    """
    toked = docs.select(F.col(id_col), tokens(text_col).alias("toks"))
    sh = toked.select(F.col(id_col), word_shingles(F.col("toks"), n).alias("shingles"))
    # explode_outer, NOT explode: InferFiltersFromGenerate turns a plain
    # explode into a pre-filter `size(<whole shingle expr>) > 0` that
    # re-evaluates the entire pipeline per row outside codegen
    # (measured ~30x slowdown). explode_outer infers nothing; the
    # null row an empty array produces is dropped with a cheap filter
    # on the generated column instead.
    return sh.select(id_col, F.explode_outer("shingles").alias("shingle")).filter(
        F.col("shingle").isNotNull()
    )


def jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Near-duplicate pairs by exact n-gram Jaccard similarity [N2 exact
    baseline]. Candidates from the inverted shingle index (pairs must
    share >= 1 shingle), so cost is sum of per-shingle doc-list sizes
    squared — not n^2 over the corpus."""
    ds = doc_shingles(docs, text_col, id_col, n)
    sizes = ds.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = ds.alias("a")
    b = ds.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )


def minhash_signatures(
    docs: DataFrame, k: int = 16, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """k-permutation MinHash signature per doc [N2].

    Permutation i is simulated by hashing each shingle with a salt
    (md5(f"{i}:" + shingle)) and taking the lexicographic min — the
    standard min-wise independent family, expressed as k min()
    aggregates over the exploded shingle index (one shuffle)."""
    ds = doc_shingles(docs, text_col, id_col)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"h{i}")
        for i in range(k)
    ]
    return ds.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float,
    k: int = 16,
    bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash-LSH candidate generation + exact Jaccard verification [N2].

    Signatures are split into ``bands`` bands of k/bands rows; docs
    sharing any full band become candidates (join on the band key —
    the LSH trick that replaces the all-pairs comparison); candidates
    are then verified with exact Jaccard >= threshold."""
    rows = k // bands
    sig = minhash_signatures(docs, k, text_col, id_col)
    band_cols = [
        F.concat_ws("|", F.lit(str(b)), *[F.col(f"h{b * rows + r}") for r in range(rows)]).alias(
            f"band{b}"
        )
        for b in range(bands)
    ]
    banded = sig.select(id_col, *band_cols)
    melted = banded.select(
        id_col, F.explode(F.array(*[f"band{b}" for b in range(bands)])).alias("band_key")
    )
    a = melted.alias("a")
    b_ = melted.alias("b")
    cands = (
        a.join(
            b_,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    # Exact-Jaccard verification ONLY on the candidate pairs — this is
    # the entire point of LSH: the quadratic shingle comparison runs on
    # the (tiny) candidate set, never the corpus.
    ds = doc_shingles(docs, text_col, id_col)
    sizes = ds.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    sh_a = ds.select(F.col(id_col).alias("id_a"), F.col("shingle").alias("sh_a"))
    sh_b = ds.select(F.col(id_col).alias("_idb"), F.col("shingle").alias("sh_b"))
    inter = (
        cands.join(sh_a, "id_a")
        .join(sh_b, (F.col("id_b") == F.col("_idb")) & (F.col("sh_a") == F.col("sh_b")))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard", F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )


def simhash(docs: DataFrame, bits: int = 32, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """SimHash over distinct tokens [N2]: per bit, sum +1/-1 votes from
    each token's md5; bit set iff the vote is positive. 32-bit variant
    (md5 hex chars 1..8), assembled as a BIGINT."""
    toks = (
        docs.select(F.col(id_col), F.array_distinct(tokens(text_col)).alias("dt"))
        .select(F.col(id_col), F.explode_outer("dt").alias("tok"))
        .filter(F.col("tok").isNotNull())
    )
    h = F.md5(F.col("tok"))
    # hex char -> value via position in the hex alphabet (portable).
    bit_exprs = []
    for bit in range(bits):
        ch = F.substring(h, 1 + bit // 4, 1)
        val = F.instr(F.lit("0123456789abcdef"), ch) - 1
        bit_on = F.shiftright(val, 3 - bit % 4).bitwiseAND(F.lit(1))
        bit_exprs.append(
            F.sum(F.when(bit_on == 1, 1).otherwise(-1)).alias(f"v{bit}")
        )
    votes = toks.groupBy(id_col).agg(*bit_exprs)
    acc = F.lit(0).cast("long")
    for bit in range(bits):
        acc = acc + F.when(F.col(f"v{bit}") > 0, F.lit(2**bit).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return votes.select(F.col(id_col), acc.alias("simhash"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 6, **kw) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance. All-pairs here
    (fine for verification corpora); the scale path buckets on
    band-rotations of the hash first, same as LSH."""
    sh = simhash(docs, **kw)
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("hamming").cast("long").alias("hamming"),
        )
    )
