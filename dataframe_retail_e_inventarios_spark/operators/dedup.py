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


def doc_shingle_sets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """(doc_id, shingles: array<string>) — one narrow pass, no shuffle.

    Tokenization is materialized in its own projection BEFORE the
    shingle transform: the shingle lambda references the token array
    ~3x per shingle, and Catalyst will not common-subexpression-
    eliminate an expensive regex split into a lambda — inlining it
    re-splits the text per element_at (measured 10x slowdown).

    ``max_df`` drops shingles whose document frequency exceeds the cap
    (standard MinHash practice: a stop-shingle shared by k docs carries
    no discriminative signal but costs k^2 in any pair join — the skew
    bomb at corpus scale). The hot list is one corpus aggregation whose
    output is tiny (few shingles exceed any sane cap), so it ships as a
    single-row broadcast; at 100 TB you compute it once per corpus
    snapshot and reuse it across every dedup query.
    """
    toked = docs.select(F.col(id_col), tokens(text_col).alias("toks"))
    base = toked.select(F.col(id_col), word_shingles(F.col("toks"), n).alias("shingles"))
    if max_df is not None:
        hot = (
            base.select(F.explode_outer("shingles").alias("shingle"))
            .filter(F.col("shingle").isNotNull())
            .groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df)
            .agg(F.collect_list("shingle").alias("hot"))
        )
        base = (
            base.crossJoin(F.broadcast(hot))
            .select(
                F.col(id_col),
                F.array_except(
                    "shingles", F.coalesce("hot", F.array().cast("array<string>"))
                ).alias("shingles"),
            )
        )
    return base


def doc_shingles(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """(doc_id, shingle) exploded inverted-index input."""
    sh = doc_shingle_sets(docs, text_col, id_col, n, max_df)
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
    max_df: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by exact n-gram Jaccard similarity [N2 exact
    baseline]. Candidates from the inverted shingle index (pairs must
    share >= 1 shingle), so cost is sum of per-shingle doc-list sizes
    squared — not n^2 over the corpus. ``max_df`` bounds exactly that
    per-shingle list size (see doc_shingle_sets), which turns the worst
    case from corpus-quadratic into max_df-quadratic."""
    ds = doc_shingles(docs, text_col, id_col, n, max_df)
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


def _sig_cols(k: int, shingle_col: str = "shingles") -> list:
    """k MinHash signature expressions over a shingle-set array column.

    Permutation i is simulated by hashing each shingle with a salt
    (md5(f"{i}:" + shingle)) and taking the lexicographic min — the
    standard min-wise independent family. Computed as array_min over a
    per-row transform: embarrassingly parallel, ZERO shuffle (the
    exploded-groupBy formulation pays a corpus-wide shuffle for the
    same result)."""
    def salted(i: int):
        # NOTE: a two-arg lambda would make pyspark pass the element
        # INDEX as the second argument — bind i via closure, never via
        # a default argument.
        return lambda s: F.md5(F.concat(F.lit(f"{i}:"), s))

    return [
        F.array_min(F.transform(shingle_col, salted(i))).alias(f"h{i}") for i in range(k)
    ]


def minhash_signatures(
    docs: DataFrame, k: int = 16, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """k-permutation MinHash signature per doc [N2], shuffle-free.

    Docs with no shingles (< n tokens) have no signature — same rows as
    the exploded-groupBy formulation the DuckDB oracle uses."""
    sets_ = doc_shingle_sets(docs, text_col, id_col).filter(F.size("shingles") > 0)
    return sets_.select(id_col, *_sig_cols(k))


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float,
    k: int = 16,
    bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """MinHash-LSH candidate generation + exact Jaccard verification [N2].

    Signatures are split into ``bands`` bands of k/bands rows; docs
    sharing any full band become candidates (join on the band key —
    the LSH trick that replaces the all-pairs comparison); candidates
    are then verified with exact Jaccard >= threshold.

    Single-corpus-pass shape: signatures are array_min expressions over
    the per-doc shingle SET (no exploded groupBy), and the shingle set
    rides along through the band melt, so the band self-join delivers
    both sides' sets to the verifier directly — exact Jaccard is then
    size(array_intersect) on the candidate pairs only. The two sides of
    the self-join are the identical subtree, so Spark's ReuseExchange
    materializes the tokenize+signature work ONCE (the previous
    index-join verifier re-tokenized the corpus three more times; an
    explicit persist() was measured slower cold — exchange reuse is
    free). With ``max_df`` set, the hot-shingle aggregation is the only
    second corpus pass, and its output broadcast is tiny.
    """
    rows = k // bands
    sets_ = doc_shingle_sets(docs, text_col, id_col, max_df=max_df).filter(
        F.size("shingles") > 0
    )
    sig = sets_.select(id_col, "shingles", *_sig_cols(k))
    band_cols = [
        F.concat_ws("|", F.lit(str(b)), *[F.col(f"h{b * rows + r}") for r in range(rows)]).alias(
            f"band{b}"
        )
        for b in range(bands)
    ]
    # Bands materialize as named columns BEFORE the explode; with
    # explode_outer no Generate pre-filter is inferred, so the k md5
    # transforms are never re-evaluated outside codegen (the
    # InferFiltersFromGenerate trap).
    banded = sig.select(id_col, "shingles", *band_cols)
    melted = banded.select(
        id_col,
        "shingles",
        *[f"band{b}" for b in range(bands)],
        F.posexplode_outer(F.array(*[f"band{b}" for b in range(bands)])).alias(
            "band_no", "band_key"
        ),
    ).filter(F.col("band_key").isNotNull())
    a = melted.alias("a")
    b_ = melted.alias("b")
    # Emit each pair from its FIRST matching band only (no earlier band
    # agrees): near-identical docs share every band, so without this a
    # duplicate-dense corpus inflates the join output x bands and needs
    # a dedup shuffle afterwards. Flat column comparisons, not array
    # slices (per-pair allocation). The merge hint pins the scale-shape
    # join: both sides are the identical subtree, so the sort-merge
    # exchange is built once and ReusedExchange serves the other side —
    # one tokenize+signature pass total (a broadcast self-join would
    # recompute the whole subtree per side).
    no_earlier_match = F.lit(False)
    for bno in range(bands):
        cond = F.col("a.band_no") == bno
        for j in range(bno):
            cond = cond & (F.col(f"a.band{j}") != F.col(f"b.band{j}"))
        no_earlier_match = no_earlier_match | cond
    cands = (
        a.hint("merge")
        .join(
            b_,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & no_earlier_match,
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
    )
    # Exact-Jaccard verification ONLY on the candidate pairs — this is
    # the entire point of LSH: the quadratic comparison runs on the
    # (tiny) candidate set, never the corpus.
    n_inter = F.size(F.array_intersect("sh_a", "sh_b"))
    n_union = F.size("sh_a") + F.size("sh_b") - n_inter
    return (
        cands.withColumn("jaccard", n_inter / n_union)
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


def simhash_pairs(docs: DataFrame, max_hamming: int = 3, bits: int = 32, **kw) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, banded [N2 scale
    path].

    The ``bits``-bit hash is split into ``max_hamming + 1`` contiguous
    bit bands; candidates are docs sharing any band value (equi-join on
    (band_no, band_val) — never an all-pairs join). Recall is EXACTLY
    1.0 by pigeonhole: a pair at Hamming distance d <= max_hamming has
    d flipped bits, which can dirty at most d of the max_hamming + 1
    bands, so at least one band matches. Candidates are then verified
    with bit_count on the full hashes. This is the Hamming-ball lookup
    SimHash exists for; at corpus scale each band bucket holds
    n / 2^band_width docs, so the join cost is sum-of-bucket-sizes
    squared, not n^2.
    """
    nb = max_hamming + 1
    if nb > bits:
        raise ValueError("max_hamming + 1 bands need at least that many bits")
    sh = simhash(docs, bits=bits, **kw)
    base, rem = divmod(bits, nb)
    widths = [base + (1 if i < rem else 0) for i in range(nb)]
    offsets = [sum(widths[:i]) for i in range(nb)]
    band_cols = [
        F.shiftright("simhash", offsets[i]).bitwiseAND(F.lit((1 << widths[i]) - 1)).alias(f"bv{i}")
        for i in range(nb)
    ]
    banded = sh.select("doc_id", "simhash", *band_cols)
    melted = banded.select(
        "doc_id",
        "simhash",
        *[f"bv{i}" for i in range(nb)],
        F.posexplode_outer(F.array(*[f"bv{i}" for i in range(nb)])).alias(
            "band_no", "band_val"
        ),
    ).filter(F.col("band_val").isNotNull())
    a, b = melted.alias("a"), melted.alias("b")
    # First-matching-band emission: docs at hamming 0 share EVERY band,
    # so emitting from all of them would inflate the join output x nb
    # on duplicate-dense corpora and require a dedup shuffle; requiring
    # "no earlier band agrees" makes each pair come out exactly once.
    # Expressed as flat long comparisons (an array slice/zip_with form
    # allocates per candidate pair — measured 2x slower on a 6M-pair
    # join). The merge hint keeps the self-join sort-merge so the
    # banded exchange is built once and reused (a broadcast side would
    # recompute the simhash aggregation).
    no_earlier_match = F.lit(False)
    for bno in range(nb):
        cond = F.col("a.band_no") == bno
        for j in range(bno):
            cond = cond & (F.col(f"a.bv{j}") != F.col(f"b.bv{j}"))
        no_earlier_match = no_earlier_match | cond
    return (
        a.hint("merge")
        .join(
            b,
            (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & no_earlier_match,
        )
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
