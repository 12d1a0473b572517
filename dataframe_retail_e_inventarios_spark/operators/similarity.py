"""Vector similarity search over embedding columns [SURVEY §2.11 N3].

Brute-force cosine top-k is the exact baseline; the scale path is
LSH bucketing (random-hyperplane signs) that prunes candidates before
the exact re-rank. Dot products run inside codegen via zip_with +
aggregate (elements widened to double BEFORE multiply, left-fold
accumulation — bit-compatible with the DuckDB oracle's
list_inner_product over DOUBLE[]).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.functions import pandas_udf


def planted_neighbors_corpus(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    eps: float = 0.001,
    id_base: int = 100_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Corpus ∪ k deterministic planted near-neighbors per query — the
    recall fixture the approximate-ANN driver gates run against.

    The natural test corpus has NO true neighbors (max pairwise cos
    ~0.5, pure noise floor), so raw approximate output can't be
    oracle-gated: shortlist membership is implementation-defined
    there. Planted neighbor j of query q is the query vector scaled by
    (1 + eps·j) — direction preserved EXACTLY (cos = 1 up to float
    rounding, far above the noise floor) and squared-L2 distance
    eps·j·‖v‖, far below any natural candidate — so every correct ANN
    index, under any partitioning/config, must retrieve them; a floor
    on planted recall is therefore a deterministic boolean a SQL
    oracle can assert TRUE. Planted ids are id_base + qid·100 + j
    (j in 1..k), labels inherited from the query. All planting is
    native column expressions (explode over a sequence + a transform
    over the array) — no driver-side materialization, scales with the
    query set, not the corpus."""
    # Guard the id arithmetic (r10 ADVICE): planted ids live at
    # id_base + qid*100 + j, so j must stay under the 100-wide stride
    # and every NATURAL id must stay below id_base — otherwise a
    # natural row could masquerade as a planted hit and the recall
    # gate could pass falsely. k is checked eagerly; the id ceiling is
    # enforced lazily inside the plan (raise_error on the natural
    # branch) so no extra corpus scan is spent on the assert.
    if k >= 100:
        raise ValueError(f"planted_neighbors_corpus: k={k} must be < 100 (id stride)")
    natural_id = F.when(
        F.col(id_col) >= id_base,
        F.raise_error(
            F.concat(
                F.lit(
                    f"planted_neighbors_corpus: natural {id_col} >= id_base "
                    f"{id_base} collides with planted id space: "
                ),
                F.col(id_col).cast("string"),
            )
        ),
    ).otherwise(F.col(id_col))
    embeddings = embeddings.withColumn(id_col, natural_id)
    q = embeddings.filter(F.col(id_col) < n_queries)
    j = F.col("_j")
    planted = q.select(
        F.col(id_col),
        F.col(label_col),
        F.col(vec_col),
        F.explode(F.sequence(F.lit(1), F.lit(k))).alias("_j"),
    ).select(
        (F.lit(id_base) + F.col(id_col) * 100 + j).alias(id_col),
        F.transform(
            F.col(vec_col),
            lambda x: (x * (F.lit(1.0) + F.lit(eps) * j)).cast("float"),
        ).alias(vec_col),
        F.col(label_col),
    )
    return embeddings.select(id_col, vec_col, label_col).unionByName(planted)


def planted_recall_gate(
    topk: DataFrame,
    query_col: str,
    k: int = 10,
    floor: int | None = None,
    id_base: int = 100_000,
) -> DataFrame:
    """Fold an ANN top-k result over the planted corpus into the
    driver-visible contract: (query_id, n_retrieved, planted_recall_ok)
    where the boolean asserts >= ``floor`` of the k planted neighbors
    were retrieved (default floor: k-1, i.e. 0.9 recall at k=10 — tied
    to k so raising the planted count scales the gate with it). The
    approximate ranks/distances stay OUT of the value hash; the exact
    row count and the recall floor are the deterministic parts (r9
    verdict #3 — same pattern as the sketch tolerance bands)."""
    if floor is None:
        floor = k - 1
    hit = (F.col("cand_id") >= id_base) & (
        F.floor((F.col("cand_id") - id_base) / 100) == F.col(query_col)
    )
    return (
        topk.groupBy(query_col)
        .agg(
            F.count(F.lit(1)).alias("n_retrieved"),
            F.sum(hit.cast("long")).alias("_n_planted_found"),
        )
        .select(
            F.col(query_col).cast("long").alias("query_id"),
            F.col("n_retrieved").cast("long").alias("n_retrieved"),
            (F.col("_n_planted_found") >= floor).alias("planted_recall_ok"),
        )
        .orderBy("query_id")
    )


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Inner product, bit-identical to DuckDB's ``list_inner_product``
    over DOUBLE[] (left-fold accumulation, elements widened to double
    BEFORE the multiply).

    With ``dim`` given (the embedding width is fixed per corpus), the
    fold is UNROLLED into a flat left-associative sum of ``dim``
    products — the same addition sequence (including the leading
    ``0.0 +``, which fixes the sign of an all-negative-zero sum), so
    the result is bitwise unchanged, but the expression stays inside
    whole-stage codegen instead of Catalyst's interpreted
    higher-order-function evaluator. Measured on the all-pairs
    near-dup sweep this is the difference between ~3 interpreted
    lambda evaluations per element per pair and straight-line JVM
    arithmetic (~20x on the pair stage)."""
    if dim is not None:
        acc = F.lit(0.0)
        for i in range(1, dim + 1):
            acc = acc + F.element_at(a, i).cast("double") * F.element_at(b, i).cast(
                "double"
            )
        return acc
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    denom = norm(a, dim) * norm(b, dim)
    return F.when(denom != 0, dot(a, b, dim) / denom).otherwise(F.lit(0.0))


def cosine_topk(
    embeddings: DataFrame,
    query_filter: Column,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query vector (brute force).

    The query side is broadcast — the candidate scan never shuffles;
    ranking is a per-query-partition window top-k, no global sort.
    """
    from pyspark.sql import Window

    q = embeddings.filter(query_filter).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = embeddings.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cvec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("qvec"), F.col("cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "cand_id", F.round("cos", 6).alias("cos"), F.col("rk").cast("long").alias("rk"))
    )


def hard_negative_topk(
    embeddings: DataFrame,
    anchor_filter: Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_digits: int = 6,
    max_anchors: int = 65_536,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor,
    the k nearest candidates with a DIFFERENT label — the negatives a
    contrastive loss learns most from (near the anchor in embedding
    space but semantically wrong).

    Runs on the blocked-GEMM kernel (``gemm_cosine_topk``'s shape):
    candidate Arrow batches score against the whole anchor matrix in
    one BLAS matmul, same-label columns are masked to -inf, and each
    batch emits only its local top-k per anchor — the shuffle carries
    O(n_batches x n_anchors x k) rows, never the n_cands x n_anchors
    score matrix. The fold-cosine path measured 11 s at sf0.1 for
    200 anchors x 5000 candidates; this kernel does the same mining
    sub-second. Ranking follows the GEMM parity rule: scores are
    rounded BEFORE ranking (BLAS accumulates in a different order
    than a left fold), negative_id breaks ties.

    Scale posture: anchors are the bounded side (a training batch /
    curriculum slice), shipped in the UDF closure; the candidate scan
    never shuffles before the batch-local reduction. The bound is
    ENFORCED, not just documented: the driver-side fetch is capped at
    ``max_anchors`` + 1 rows (65 536 anchors x 64 dims x 8 B ≈ 34 MB
    closure — broadcast-sized) and raises past it, mirroring the
    all-pairs cap in ``cosine_neardup_pairs`` — an oversized
    ``anchor_filter`` must fail loudly, never OOM the driver.
    """
    from pyspark.sql import Window

    rows = (
        embeddings.filter(anchor_filter)
        .select(
            F.col(id_col).alias("aid"),
            F.col(label_col).alias("albl"),
            F.col(vec_col).cast("array<double>"),
        )
        .limit(max_anchors + 1)
        .collect()
    )
    if not rows:
        raise ValueError("hard_negative_topk: anchor_filter selected no vectors")
    if len(rows) > max_anchors:
        raise ValueError(
            f"hard_negative_topk: anchor_filter selected more than "
            f"max_anchors={max_anchors} vectors — the anchor side is a "
            f"bounded training batch shipped in the UDF closure; slice "
            f"the anchors into batches, or raise max_anchors explicitly "
            f"if a larger closure is intended."
        )
    aids = np.array([r[0] for r in rows], dtype=np.int64)
    albls = np.array([r[1] for r in rows], dtype=np.int64)
    Q = np.stack([np.asarray(r[2], dtype=np.float64) for r in rows])
    qnorm = np.sqrt((Q * Q).sum(axis=1))

    out_schema = (
        "anchor_id long, anchor_label int, negative_id long, "
        "negative_label int, cos double"
    )

    def score_batches(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["cvec"].to_numpy()]
            )
            cids = pdf["negative_id"].to_numpy(dtype=np.int64)
            clbls = pdf["negative_label"].to_numpy(dtype=np.int64)
            cnorm = np.sqrt((C * C).sum(axis=1))
            denom = np.outer(cnorm, qnorm)
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = np.where(denom != 0.0, (C @ Q.T) / denom, 0.0)
            sims = np.round(sims, round_digits)
            sims[clbls[:, None] == albls[None, :]] = -np.inf  # mask same label
            take = min(k, len(cids))
            # one emission frame per batch (a per-anchor pd.DataFrame
            # loop was 60% of kernel wall at 200 anchors)
            aid_parts, nid_parts, cos_parts = [], [], []
            albl_parts, nlbl_parts = [], []
            for j in range(len(aids)):
                col = sims[:, j]
                order = np.lexsort((cids, -col))[:take]
                keep = order[col[order] != -np.inf]
                aid_parts.append(np.full(len(keep), aids[j], dtype=np.int64))
                albl_parts.append(np.full(len(keep), albls[j], dtype=np.int32))
                nid_parts.append(cids[keep])
                nlbl_parts.append(clbls[keep].astype(np.int32))
                cos_parts.append(col[keep])
            yield pd.DataFrame(
                {
                    "anchor_id": np.concatenate(aid_parts),
                    "anchor_label": np.concatenate(albl_parts),
                    "negative_id": np.concatenate(nid_parts),
                    "negative_label": np.concatenate(nlbl_parts),
                    "cos": np.concatenate(cos_parts),
                }
            )

    cands = embeddings.select(
        F.col(id_col).alias("negative_id"),
        F.col(label_col).alias("negative_label"),
        F.col(vec_col).alias("cvec"),
    )
    partial = cands.mapInPandas(score_batches, out_schema)
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cos").desc(), "negative_id"
    )
    return (
        partial.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "anchor_id",
            "anchor_label",
            "negative_id",
            "negative_label",
            "cos",
            F.col("rk").cast("long").alias("rk"),
        )
    )


def cosine_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int = 100_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, exact all-pairs [N1
    embedding variant]. O(n^2): this is the SMALL-CORPUS ORACLE TWIN
    for verifying the bucketed scale path below — corpus-wide runs use
    cosine_neardup_pairs_bucketed.

    Because this is a user-facing registered surface, the O(n^2) plan
    is GUARDED: the corpus is counted first (one cheap column-pruned
    scan — metadata-only for parquet row counts) and anything above
    ``max_rows`` raises instead of silently launching a quadratic job.
    100k rows = 5e9 candidate pairs, the outer edge of what an exact
    all-pairs sweep should ever attempt; past that the LSH-banded
    ``cosine_neardup_pairs_bucketed`` (recall 1.0 for true near-dups)
    is the only defensible plan. Loose thresholds near the noise floor
    (the regime LSH provably cannot bucket — see the bucketed
    docstring) are small-corpus analytics by nature, so the guard
    encodes the real semantic boundary, not an arbitrary limit.
    """
    # One guard scan does double duty: the row count for the O(n^2)
    # cap AND the (min, max) vector width. A rectangular corpus (the
    # normal case) unlocks the unrolled-dot fast path — bitwise the
    # same sums as the fold (see ``dot``) but inside codegen; ragged
    # widths fall back to the interpreted fold, never a wrong answer.
    stats = embeddings.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.size(F.col(vec_col))).alias("dmin"),
        F.max(F.size(F.col(vec_col))).alias("dmax"),
    ).first()
    n = stats["n"]
    dim = stats["dmin"] if stats["dmin"] == stats["dmax"] else None
    if n > max_rows:
        raise ValueError(
            f"cosine_neardup_pairs is an exact all-pairs (O(n^2)) operator "
            f"guarded at max_rows={max_rows}, got {n} vectors: use "
            f"cosine_neardup_pairs_bucketed (banded sign-LSH, recall 1.0 "
            f"for true near-duplicates) for corpus-scale runs, or raise "
            f"max_rows explicitly if a quadratic sweep is intended."
        )
    # Norms are per-VECTOR quantities: compute them once per side
    # before the join (2n folds) instead of once per pair (2·n²/2).
    # na*nb keeps the norm(a)*norm(b) multiply order; IEEE multiply is
    # commutative anyway, so the denominator is bitwise unchanged.
    # The stream side repartitions first: a single-file corpus scans
    # as ONE partition, which would run the entire O(n^2) pair loop in
    # one task (the BNLJ stream side keeps the scan's partitioning).
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    a = (
        embeddings.repartition(par, F.col(id_col))
        .select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
        .withColumn("na", norm(F.col("va"), dim))
    )
    b = embeddings.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    ).withColumn("nb", norm(F.col("vb"), dim))
    denom = F.col("na") * F.col("nb")
    cos = F.when(denom != 0, dot(F.col("va"), F.col("vb"), dim) / denom).otherwise(
        F.lit(0.0)
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )


def _plane_projections(n_planes: int, seed: int = 7):
    """Arrow-batched hyperplane projections: a pandas_udf computing all
    ``n_planes`` Gaussian random projections of each vector as ONE
    numpy matmul per batch (rows x dim) @ (dim x n_planes).

    This is the sanctioned vectorized-UDF escape hatch, taken on
    measurement, not reflex: the all-native formulation (one
    zip_with/aggregate fold building every plane's contribution per
    element) runs in Catalyst's INTERPRETED higher-order-function
    evaluator — 2048 lambda evaluations plus two 32-slot array
    allocations per 64-dim vector — and measured 3.5x slower at sf0.1
    (1.22 s vs 0.35 s for the projection pass), a gap that widens with
    corpus size since BLAS throughput vs interpreted-expression
    throughput is ~100x. (Earlier native variants were worse still:
    an arithmetic xorshift weight chain 4x slower than murmur3; a
    sinusoid family sin(i + 1000p) collapses all planes into span{
    sin(i), cos(i)} by the angle-sum identity — 64 near-uniform
    buckets over a 2000-vector corpus, destroying pruning and recall.)

    The weight matrix is seeded (dim inferred from the first batch), so
    band keys are deterministic across runs and executors. Gaussian
    entries make this the textbook Charikar sign-LSH family. Nothing
    downstream depends on the weights themselves — oracles compare
    final pair/top-k output, and exact-direction duplicates collide in
    every band for ANY weight family."""

    @pandas_udf("array<double>")
    def proj(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        mat = np.vstack(v.to_numpy()).astype(np.float64)
        weights = np.random.RandomState(seed).standard_normal(
            (mat.shape[1], n_planes)
        )
        return pd.Series(list(mat @ weights))

    return proj


def _rademacher_int_projections(n_planes: int, seed_tag: str = "lshw"):
    """Arrow-batched DETERMINISTIC sign-LSH projections, exact-integer
    arithmetic end to end — the oracle-checkable twin of the Gaussian
    ``_plane_projections`` family.

    Weights are Rademacher (+1/-1) — a valid sign-random-projection
    family (Achlioptas' database-friendly projections) — derived per
    (plane, dim) cell from an md5 parity, the repo's standard
    engine-portable seed (same construction DuckDB reproduces
    bit-identically for the Bloom bitmap, operators/bloom.py). Each
    element is snapped to a 6dp-scaled BIGINT (np.round is half-even
    <-> round_even; values |e| < 1 make the products |proj| < 2^26,
    far inside int64), so the projection SUM is order-independent
    integer arithmetic — no cross-engine float-accumulation gap, and
    the hyperplane SIGNS (all LSH needs) are bit-reproducible in SQL:

        CAST(('0x' || substr(md5('lshw:' || p || ':' || d), 1, 8))
             AS BIGINT) % 2 = 0  ->  +1 else -1

    The matmul itself is one int64 BLAS-shaped numpy product per Arrow
    batch, same throughput shape as the Gaussian path."""

    @pandas_udf("array<bigint>")
    def proj(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        import hashlib

        mat = np.vstack(v.to_numpy()).astype(np.float64)
        dim = mat.shape[1]
        w = np.empty((dim, n_planes), dtype=np.int64)
        for p in range(n_planes):
            for d in range(dim):
                h = hashlib.md5(f"{seed_tag}:{p}:{d}".encode()).hexdigest()
                w[d, p] = 1 if int(h[:8], 16) % 2 == 0 else -1
        ei = np.rint(np.round(mat, 6) * 1e6).astype(np.int64)
        return pd.Series(list(ei @ w))

    return proj


def with_sign_band_keys(
    df: DataFrame,
    vec_col: str,
    n_planes: int = 32,
    bands: int = 4,
    prefix: str = "bk",
    int_exact: bool = False,
) -> DataFrame:
    """df + ``bands`` LSH band-key columns ({prefix}0..), each the sign
    pattern of n_planes/bands hyperplane projections (band index
    prefixed so keys from different bands never collide). The
    projection array materializes as its own column (the ArrowEvalPython
    node runs once); the sign bits above it are plain element_at
    references. ``int_exact=True`` swaps the Gaussian family for the
    deterministic integer Rademacher one (oracle-reproducible signs —
    see ``_rademacher_int_projections``)."""
    rows = n_planes // bands
    family = (
        _rademacher_int_projections(n_planes)
        if int_exact
        else _plane_projections(n_planes)
    )
    tmp = df.withColumn("_projs", family(F.col(vec_col)))
    keys = []
    for b in range(bands):
        bits = [
            F.when(F.element_at("_projs", b * rows + r + 1) >= 0, F.lit("1")).otherwise(
                F.lit("0")
            )
            for r in range(rows)
        ]
        keys.append(F.concat(F.lit(f"{b}|"), *bits).alias(f"{prefix}{b}"))
    return tmp.select(*df.columns, *keys)


def cosine_neardup_pairs_bucketed(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 32,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs via banded sign-LSH candidates + exact
    cosine verification [N3 scale path].

    Candidates are pairs sharing at least one band of hyperplane signs
    (equi-join on the band key — never an all-pairs join); every
    candidate is verified with the exact cosine, so precision is exact
    and only recall is probabilistic: a pair at angle θ matches a band
    with (1 - θ/π)^(n_planes/bands), and misses all ``bands`` bands
    with the complement^bands. Two regimes matter:

    - TRUE near-duplicates (cos ≈ 1: exact copies, rescales, tiny
      perturbations — what corpus dedup actually hunts): θ ≈ 0, every
      plane agrees, so the pair collides in EVERY band — recall is
      exactly 1.0, deterministically, for any banding.
    - Loose thresholds near the random-pair noise floor (e.g. 0.35 on
      this synthetic corpus, whose max natural pairwise cos is ~0.51)
      are NOT bucketable by any sublinear scheme — at θ ≈ 60-70° the
      per-plane agreement (~0.6) is statistically indistinguishable
      from unrelated pairs (0.5). That regime belongs to the exact
      all-pairs twin above; asking LSH for it means recall < 1 or no
      pruning.

    At 100 TB: one narrow projection pass (n_planes dot products per
    vector, JVM-side), one shuffle on the band key (the self-join's
    two sides are the identical subtree — ReuseExchange materializes
    it once), exact verify on candidates only.
    """
    emb = embeddings.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
    keyed = with_sign_band_keys(emb, "vec", n_planes, bands)
    # Keys materialize as named columns BEFORE the explode; explode_outer
    # dodges the InferFiltersFromGenerate re-evaluation trap.
    melted = keyed.select(
        "vid",
        "vec",
        F.explode_outer(F.array(*[f"bk{b}" for b in range(bands)])).alias("band_key"),
    ).filter(F.col("band_key").isNotNull())
    a, b_ = melted.alias("a"), melted.alias("b")
    # The merge hint pins the self-join to sort-merge: both sides are
    # the identical subtree, so the band-key exchange is built once and
    # ReusedExchange serves the other side — ONE ArrowEvalPython
    # projection pass over the corpus (AQE would otherwise broadcast
    # the "small" side and recompute the whole keyed subtree for it;
    # measured 1.7 s -> 1.0 s at sf0.1).
    cands = (
        a.hint("merge")
        .join(
            b_,
            (F.col("a.band_key") == F.col("b.band_key")) & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            F.col("a.vec").alias("va"),
            F.col("b.vec").alias("vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cands.withColumn("cos", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query_filter: Column,
    k: int = 10,
    n_planes: int = 24,
    bands: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Banded random-hyperplane LSH ANN: vectors bucket into ``bands``
    sign-pattern keys (n_planes/bands bits each); a candidate is any
    vector sharing AT LEAST ONE band with the query (OR-construction
    — the single-bucket AND-construction probes measured recall@10 of
    only 0.16 on this corpus), then exact cosine re-rank on candidates.

    Defaults (r=2, b=12) are tuned for this synthetic corpus, whose
    "neighbors" sit barely above the random-pair noise floor (top-10
    cosines ~0.3-0.5): shallow bands buy recall (measured mean
    recall@10 = 1.00; r=3 x 8 bands measures 0.88 with stronger
    pruning) at the cost of a high candidate fraction. On a real,
    clustered embedding corpus raise r (bits per band) — collision
    probability separates sharply once neighbors are actually close.

    At 100 TB the query side is tiny and broadcast; the corpus side
    computes its band keys in one narrow pass and never shuffles —
    the bucket join replaces the per-query full scan.

    This path uses the DETERMINISTIC integer-Rademacher plane family
    (``_rademacher_int_projections``): hyperplane signs are exact
    md5-seeded int64 arithmetic a SQL engine reproduces bit-for-bit,
    so although the operator is approximate-by-construction as ANN,
    its OUTPUT is fully deterministic and sits under the value-hash
    oracle gate — the DuckDB twin rebuilds the same plane matrix,
    the same band keys, the same candidate set, and the same exact
    re-rank (r5 verdict #3). Recall@10 vs the brute-force baseline is
    additionally asserted in tests.
    """
    from pyspark.sql import Window

    keyed = with_sign_band_keys(
        embeddings.select(F.col(id_col), F.col(vec_col)), vec_col, n_planes, bands,
        int_exact=True,
    )
    melted = keyed.select(
        F.col(id_col),
        F.col(vec_col),
        F.explode_outer(F.array(*[f"bk{b}" for b in range(bands)])).alias("band_key"),
    ).filter(F.col("band_key").isNotNull())
    q = melted.filter(query_filter).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), "band_key"
    )
    c = melted.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cvec"), "band_key"
    )
    scored = (
        c.join(F.broadcast(q), "band_key")
        .filter(F.col("cand_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "cand_id"])
        .withColumn("cos", cosine(F.col("qvec"), F.col("cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "cand_id", F.round("cos", 6).alias("cos"), F.col("rk").cast("long").alias("rk"))
    )


def _snap_int6(val: Column) -> Column:
    """6dp-scaled BIGINT element snap, the engine-portable integer
    embedding grid shared with the Rademacher LSH family. DuckDB twin:
    ``CAST(round(round_even(v[d+1], 6) * 1e6, 0) AS BIGINT)`` (the
    scaled value sits within float error of an integer, so half-up vs
    half-even at the final round is moot)."""
    return F.round(F.bround(val.cast("double"), 6) * F.lit(1e6), 0).cast("long")


def _dot_dec(a: Column, b: Column) -> Column:
    """Exact integer inner product of two BIGINT arrays, accumulated in
    DECIMAL(38,0) — order-independent, overflow-proof (|x| ≤ 1e6-grid
    elements x trillion-member centroid sums stay far below 1e38), and
    reproduced exactly by DuckDB's SUM over HUGEINT products."""
    prods = F.zip_with(
        a, b, lambda x, y: (x.cast("decimal(38,0)") * y.cast("decimal(38,0)"))
    )
    res = F.aggregate(
        prods,
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, x: (acc + x).cast("decimal(38,0)"),
    )
    # With ANSI off, DECIMAL overflow returns NULL instead of erroring;
    # a NULL dot would silently rank as "no similarity" (wrong cell
    # assignments) rather than failing. Guard: non-null inputs must
    # yield a non-null dot. assert_true is NULL when the invariant
    # holds, so the coalesce term adds exactly 0.
    # A NULL *element* inside a non-null array also nulls the
    # aggregate; that is a sparse-input contract violation, not an
    # overflow — except it from the overflow assert so the message
    # never misleads (NULL dot then propagates as NULL similarity).
    guard = F.assert_true(
        res.isNotNull()
        | a.isNull()
        | b.isNull()
        | F.exists(a, lambda x: x.isNull())
        | F.exists(b, lambda y: y.isNull()),
        F.lit(
            "_dot_dec: DECIMAL(38,0) overflow (NULL dot from non-null, "
            "dense arrays) — element magnitudes exceed the documented "
            "1e6-grid bound; rescale before the dot product"
        ),
    )
    return res + F.coalesce(guard.cast("decimal(38,0)"), F.lit(0).cast("decimal(38,0)"))


def _int_cosine(dot_dec: Column, n2_a: Column, n2_b: Column) -> Column:
    """Cosine from exact integer dot/norm² aggregates: ONE conversion
    of each exact integer to double, then IEEE sqrt/mult/divide — the
    identical double on any engine (no cross-engine float
    accumulation; the only inexact steps are deterministic)."""
    denom = F.sqrt(n2_a.cast("double")) * F.sqrt(n2_b.cast("double"))
    return F.when(denom != 0, dot_dec.cast("double") / denom).otherwise(F.lit(0.0))


def ivf_index(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    label_col: str = "label",
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer [N3 scale path]: centroids from the label
    partitions (stand-in for a k-means fit — at scale the centroids
    come from MLlib KMeans on a sample; the index/probe machinery here
    is identical), plus the inverted-list assignment of every vector
    to its nearest centroid.

    DETERMINISTIC, engine-portable construction (r6 verdict #2, the
    ``ann_lsh_bucketed_topk`` precedent): elements snap to the 6dp
    BIGINT grid, the centroid is the EXACT integer element-wise sum of
    its label members (cosine is scale-invariant, so ranking against
    the sum IS ranking against the mean — no division, no float
    accumulation), and every vector↔centroid similarity is an exact
    DECIMAL(38,0) dot over those integers with one final
    double-conversion. DuckDB rebuilds the identical integers and
    therefore the identical cell assignment, so the probe output sits
    under the full value-hash oracle gate despite IVF being
    approximate-by-construction as ANN.

    Returns (centroids: label/centroid(double[], = integer sums)/
    csv(bigint[])/cn2(decimal norm²), assignments: id/cell).
    """
    el = embeddings.select(
        F.col(id_col).alias("cand_id"),
        F.col(label_col),
        F.posexplode(vec_col).alias("pos", "val"),
    ).select(
        "cand_id", label_col, "pos", _snap_int6(F.col("val")).alias("ei")
    )
    csum = el.groupBy(label_col, "pos").agg(F.sum("ei").alias("cs"))
    cent = csum.groupBy(label_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cs"))),
            lambda s: s["cs"].cast("double"),
        ).alias("centroid"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cs"))), lambda s: s["cs"]
        ).alias("csv"),
    )
    cent = cent.withColumn("cn2", _dot_dec(F.col("csv"), F.col("csv")))
    vecs = embeddings.select(
        F.col(id_col).alias("cand_id"),
        F.transform(vec_col, _snap_int6).alias("vi"),
    ).withColumn("vn2", _dot_dec(F.col("vi"), F.col("vi")))
    scored = vecs.crossJoin(F.broadcast(cent)).withColumn(
        "sim", _int_cosine(_dot_dec(F.col("vi"), F.col("csv")), F.col("vn2"), F.col("cn2"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("cand_id").orderBy(F.col("sim").desc(), F.col(label_col))
    assign = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("cand_id", F.col(label_col).alias("cell"))
    )
    return cent, assign


def _ivf_probe(
    embeddings: DataFrame,
    cent: DataFrame,
    assign: DataFrame,
    query_filter: Column,
    k: int,
    nprobe: int,
    id_col: str,
    vec_col: str,
    cell_col: str,
) -> DataFrame:
    """Shared IVF probe: rank centroids per query, search only the
    vectors in the ``nprobe`` nearest inverted lists, exact cosine
    re-rank inside. ``cent`` must have (cell_col, centroid); ``assign``
    (cand_id, cell_col)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    q = embeddings.filter(query_filter).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    qcells = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("sim", cosine(F.col("qvec"), F.col("centroid")))
        .withColumn(
            "crk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col(cell_col))
            ),
        )
        .filter(F.col("crk") <= nprobe)
        .select("query_id", "qvec", F.col(cell_col).alias("cell"))
    )
    cands = embeddings.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cvec")
    ).join(assign.withColumnRenamed(cell_col, "cell"), "cand_id")
    scored = (
        cands.join(F.broadcast(qcells), "cell")
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("qvec"), F.col("cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "cand_id", F.round("cos", 6).alias("cos"),
                F.col("rk").cast("long").alias("rk"))
    )


def ivf_topk(
    embeddings: DataFrame,
    query_filter: Column,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """IVF probe over label-derived centroids (deterministic stand-in
    quantizer — the probe machinery is identical to the k-means
    variant below). At 100 TB the probed lists are a small fraction of
    the corpus — the scan cost drops by ~n_cells/nprobe.

    Approximate as an ANN ALGORITHM, but fully DETERMINISTIC in
    output: index build, cell assignment and query-cell ranking all
    run in exact snapped-integer arithmetic (see ``ivf_index``), and
    the final re-rank is the same left-fold double cosine DuckDB's
    ``list_inner_product`` reproduces bitwise — so the query carries a
    full value-hash DuckDB oracle (r6 verdict #2), plus recall tests
    vs the brute-force baseline."""
    from pyspark.sql import Window

    cent, assign = ivf_index(embeddings, id_col, vec_col, label_col)
    q = embeddings.filter(query_filter).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.transform(vec_col, _snap_int6).alias("qi"),
    ).withColumn("qn2", _dot_dec(F.col("qi"), F.col("qi")))
    qcells = (
        q.crossJoin(F.broadcast(cent))
        .withColumn(
            "sim",
            _int_cosine(_dot_dec(F.col("qi"), F.col("csv")), F.col("qn2"), F.col("cn2")),
        )
        .withColumn(
            "crk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("sim").desc(), F.col(label_col)
                )
            ),
        )
        .filter(F.col("crk") <= nprobe)
        .select("query_id", "qvec", F.col(label_col).alias("cell"))
    )
    cands = embeddings.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cvec")
    ).join(assign, "cand_id")
    scored = (
        cands.join(F.broadcast(qcells), "cell")
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("qvec"), F.col("cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "cand_id", F.round("cos", 6).alias("cos"),
                F.col("rk").cast("long").alias("rk"))
    )


def ivf_kmeans_topk(
    embeddings: DataFrame,
    query_filter: Column,
    k: int = 10,
    nprobe: int = 2,
    n_cells: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF with a REAL coarse quantizer: MLlib KMeans (seeded, so the
    index is reproducible) fit on the corpus, inverted lists from
    model.transform, same nprobe re-rank as ivf_topk.

    At 100 TB you fit the quantizer on a sample (KMeans cost is
    per-iteration linear in rows x cells) and broadcast the centroid
    table — exactly what happens here: clusterCenters() is model
    metadata (n_cells x dim floats), not a data collect."""
    import pyspark.sql.functions as F
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = embeddings.select(
        F.col(id_col).alias("cand_id"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=20).fit(feat)
    assign = model.transform(feat).select("cand_id", F.col("prediction").alias("cell"))
    spark = embeddings.sparkSession
    cent = spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell int, centroid array<double>",
    )
    return _ivf_probe(
        embeddings, cent, assign, query_filter, k, nprobe, id_col, vec_col, "cell"
    )


def gemm_cosine_topk(
    embeddings: DataFrame,
    query_filter: Column,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    max_queries: int = 65_536,
) -> DataFrame:
    """Exact cosine top-k via blocked matrix multiplication — the
    vectorized twin of ``cosine_topk``.

    ``cosine_topk`` scores candidate x query pairs one row at a time
    inside codegen (zip_with fold): correct, but the per-pair cost is
    interpreted expression evaluation over arrays. This path instead
    streams candidate Arrow batches through ``mapInPandas`` and scores
    each batch against the WHOLE query matrix with one numpy GEMM
    (batch x dim @ dim x n_q) — the classic brute-force-ANN kernel,
    BLAS-backed, ~dim x fewer interpreter steps per pair. Each batch
    emits only its local top-k rows per query (argpartition), so the
    shuffle that feeds the final per-query merge carries
    O(n_batches * n_q * k) rows, never the full n_cands * n_q score
    matrix.

    Ranking ties are pinned the same way on both engines: scores are
    rounded to ``round_digits`` BEFORE ranking (GEMM accumulates in a
    different order than a left fold, so unrounded last-ulp ordering
    is not reproducible across engines), then cand_id breaks ties.

    Scale posture: queries are collected driver-side and shipped in
    the UDF closure — the contract is a bounded query set (same as
    ``cosine_topk``'s broadcast side); the candidate scan never
    shuffles before the batch-local top-k reduction. The bound is
    ENFORCED: the fetch is capped at ``max_queries`` + 1 rows and
    raises past it (see ``hard_negative_topk`` for the sizing math) —
    an oversized ``query_filter`` must fail loudly, never OOM the
    driver.
    """
    from pyspark.sql import Window

    rows = (
        embeddings.filter(query_filter)
        .select(F.col(id_col).alias("qid"), F.col(vec_col).cast("array<double>"))
        .limit(max_queries + 1)
        .collect()
    )
    if not rows:
        raise ValueError("gemm_cosine_topk: query_filter selected no vectors")
    if len(rows) > max_queries:
        raise ValueError(
            f"gemm_cosine_topk: query_filter selected more than "
            f"max_queries={max_queries} vectors — the query side is a "
            f"bounded closure-shipped matrix; batch the queries, or "
            f"raise max_queries explicitly if a larger closure is "
            f"intended."
        )
    qids = np.array([r[0] for r in rows], dtype=np.int64)
    Q = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    qnorm = np.sqrt((Q * Q).sum(axis=1))

    out_schema = "query_id long, cand_id long, cos double"

    def score_batches(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["cvec"].to_numpy()]
            )
            cids = pdf["cand_id"].to_numpy(dtype=np.int64)
            cnorm = np.sqrt((C * C).sum(axis=1))
            denom = np.outer(cnorm, qnorm)
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = np.where(denom != 0.0, (C @ Q.T) / denom, 0.0)
            sims = np.round(sims, round_digits)
            sims[cids[:, None] == qids[None, :]] = -np.inf  # mask self
            take = min(k, len(cids))
            parts = []
            for j in range(len(qids)):
                col = sims[:, j]
                # batch-local top-k on (score desc, cand_id asc)
                order = np.lexsort((cids, -col))[:take]
                keep = order[col[order] != -np.inf]
                parts.append(
                    pd.DataFrame(
                        {
                            "query_id": qids[j],
                            "cand_id": cids[keep],
                            "cos": col[keep],
                        }
                    )
                )
            yield pd.concat(parts, ignore_index=True)

    cands = embeddings.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cvec")
    )
    partial = cands.mapInPandas(score_batches, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "cand_id")
    return (
        partial.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "cand_id", "cos", F.col("rk").cast("long").alias("rk"))
    )
