"""Similarity-search properties (SURVEY §2.11 N3): banded sign-LSH
recall, bucketed near-dup exactness on true duplicates."""

import pyspark.sql.functions as F

from dataframe_retail_e_inventarios_spark.operators.similarity import (
    cosine_neardup_pairs_bucketed,
    cosine_topk,
    lsh_bucketed_topk,
)
from dataframe_retail_e_inventarios_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


def _topk_sets(rows):
    out = {}
    for r in rows:
        out.setdefault(r.query_id, set()).add(r.cand_id)
    return out


def test_lsh_ann_recall_floor(spark):
    """Mirror of the IVF recall test: banded sign-LSH recall@10 vs the
    brute-force baseline must clear a floor on the fixture corpus
    (measured 1.00 mean at the default r=2 x 12 bands with decorrelated
    hash planes — the floor leaves margin but would catch a banding or
    plane-correlation regression: single-bucket probe measured 0.16,
    the collapsed sin-plane family 0.795)."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    qf = F.col("vec_id") < 20
    exact = _topk_sets(cosine_topk(emb, qf, k=10).collect())
    approx = _topk_sets(lsh_bucketed_topk(emb, qf, k=10).collect())
    recalls = [
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ]
    assert len(recalls) == 20
    assert sum(recalls) / len(recalls) >= 0.8


def test_lsh_ann_is_exact_on_candidates(spark):
    """Candidates-then-verify: every (query, cand) the LSH path returns
    must carry the same cosine the exact path computes for that pair."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    qf = F.col("vec_id") < 5
    exact = {
        (r.query_id, r.cand_id): r.cos
        for r in cosine_topk(emb, qf, k=200).collect()
    }
    for r in lsh_bucketed_topk(emb, qf, k=10).collect():
        assert exact[(r.query_id, r.cand_id)] == r.cos


def test_bucketed_neardup_finds_all_true_duplicates(spark):
    """Exact-direction duplicates (rescaled copies) have identical sign
    patterns, so banded LSH recall is exactly 1.0 for them — every
    planted pair must come back, with cos rounded to 1.0."""
    emb = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    copies = emb.filter(F.col("vec_id") < 30).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform("embedding", lambda x: (x * F.lit(2.0)).cast("float")).alias(
            "embedding"
        ),
    )
    got = cosine_neardup_pairs_bucketed(
        emb.unionByName(copies), threshold=0.999
    ).collect()
    assert {(r.id_a, r.id_b) for r in got} == {(i, i + 10000) for i in range(30)}
    assert all(r.cos == 1.0 for r in got)


def test_ivf_kmeans_recall_floor(spark):
    """The k-means IVF index clusters whatever structure the corpus
    has; with nprobe=3 of 10 cells the probe must recover a healthy
    share of the true top-10 (and be exact within probed cells by the
    shared probe machinery, covered in test_partitioning)."""
    from dataframe_retail_e_inventarios_spark.operators.similarity import (
        ivf_kmeans_topk,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    qf = F.col("vec_id") < 20
    exact = _topk_sets(cosine_topk(emb, qf, k=10).collect())
    approx = _topk_sets(ivf_kmeans_topk(emb, qf, k=10, nprobe=3).collect())
    recalls = [len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact]
    assert sum(recalls) / len(recalls) >= 0.3  # noise corpus; floor is
    # regression-level, not aspiration: nprobe=3/10 on unclustered data


def test_bucketed_neardup_plan_has_no_all_pairs_join(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    plan = (
        cosine_neardup_pairs_bucketed(emb, threshold=0.9)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "band_key" in plan


def test_allpairs_neardup_guard_raises_on_large_corpus(spark):
    """The exact all-pairs operator is a registered user-facing surface;
    above max_rows it must refuse to launch the O(n^2) join and point
    at the banded scale path instead."""
    import pytest

    from dataframe_retail_e_inventarios_spark.operators.similarity import (
        cosine_neardup_pairs,
    )

    big = spark.range(0, 1001).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="bucketed"):
        cosine_neardup_pairs(big, threshold=0.9, max_rows=1000)
    # At or below the guard the quadratic sweep is sanctioned and runs.
    small = big.limit(10)
    assert cosine_neardup_pairs(small, threshold=0.9, max_rows=1000).count() == 45


def test_gemm_topk_matches_fold_topk(spark):
    """The BLAS-blocked exact kernel must return the SAME neighbor
    sets (and ranks, modulo last-ulp rounding pinned at 6 digits) as
    the codegen zip_with fold — across a query set large enough to
    exercise multiple Arrow batches of candidates."""
    from dataframe_retail_e_inventarios_spark.operators.similarity import (
        gemm_cosine_topk,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    qf = F.col("vec_id") < 20
    fold = {
        (r.query_id, r.rk): (r.cand_id, round(r.cos, 6))
        for r in cosine_topk(emb, qf, k=10).collect()
    }
    gemm = {
        (r.query_id, r.rk): (r.cand_id, r.cos)
        for r in gemm_cosine_topk(emb, qf, k=10).collect()
    }
    assert set(fold) == set(gemm)
    for key in fold:
        assert fold[key] == gemm[key], (key, fold[key], gemm[key])


def test_gemm_topk_masks_self_and_respects_k(spark):
    from dataframe_retail_e_inventarios_spark.operators.similarity import (
        gemm_cosine_topk,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    got = gemm_cosine_topk(emb, F.col("vec_id") < 3, k=5).toPandas()
    assert (got.groupby("query_id").size() == 5).all()
    assert not ((got.query_id == got.cand_id).any())


def test_hard_negative_topk_excludes_anchor_label(spark):
    """Hard-negative mining: every returned pair crosses labels, rk is
    a dense 1..k per anchor, and the neighbor sets agree with a
    label-filtered brute force over the same fold-cosine scores."""
    from dataframe_retail_e_inventarios_spark.operators.similarity import (
        hard_negative_topk,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    rows = hard_negative_topk(emb, F.col("vec_id") % 10 == 0, k=5).collect()
    by_anchor = {}
    for r in rows:
        assert r.negative_label != r.anchor_label
        by_anchor.setdefault(r.anchor_id, []).append(r)
    for anchor, rs in by_anchor.items():
        rks = sorted(r.rk for r in rs)
        assert rks == list(range(1, len(rs) + 1))
        ordered = sorted(rs, key=lambda r: r.rk)
        coss = [r.cos for r in ordered]
        assert coss == sorted(coss, reverse=True)

    # brute force twin: label-filtered exact ranking via numpy
    import numpy as np

    pdf = emb.toPandas()
    V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    ids = pdf["vec_id"].to_numpy()
    labels = pdf["label"].to_numpy()
    norms = np.sqrt((V * V).sum(axis=1))
    for aid, rs in by_anchor.items():
        ai = int(np.where(ids == aid)[0][0])
        cos = (V @ V[ai]) / (norms * norms[ai])
        mask = labels != labels[ai]
        order = sorted(
            [(-(round(c, 6)), i) for c, i, ok in zip(cos, ids, mask) if ok]
        )[:5]
        expect = {i for _, i in order}
        got = {r.negative_id for r in rs}
        assert got == expect


def test_gemm_bounded_side_guards_raise(spark):
    """The GEMM kernels' closure-shipped side is a HARD contract: an
    oversized filter must raise (capped fetch), never silently
    collect the corpus onto the driver."""
    import pytest

    from dataframe_retail_e_inventarios_spark.operators.similarity import (
        gemm_cosine_topk,
        hard_negative_topk,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    with pytest.raises(ValueError, match="max_queries"):
        gemm_cosine_topk(emb, F.lit(True), k=3, max_queries=5).collect()
    with pytest.raises(ValueError, match="max_anchors"):
        hard_negative_topk(emb, F.lit(True), k=3, max_anchors=5).collect()
    # under the cap the guard is invisible: normal result comes back
    assert gemm_cosine_topk(emb, F.col("vec_id") < 3, k=3).count() == 9


def test_ivf_planted_neighbor_recall(spark):
    """The natural fixture is a noise-floor regime where IVF recall is
    bounded by construction; this plants true near-neighbors (cos
    ~0.999, query's own cluster) and asserts IVF retrieves them — the
    check that separates a working inverted index from a broken one."""
    import numpy as np

    from dataframe_retail_e_inventarios_spark.operators.similarity import (
        ivf_kmeans_topk,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    base = emb.select("vec_id", "label", "embedding").toPandas()
    rng = np.random.RandomState(7)
    rows, truth = [], {}
    for _, r in base[base.vec_id < 3].iterrows():
        v = np.asarray(r.embedding, dtype=np.float64)
        scale = 0.05 * float(np.sqrt((v * v).mean()))
        truth[int(r.vec_id)] = set()
        for j in range(5):
            pid = 100000 + int(r.vec_id) * 100 + j
            rows.append(
                (pid, int(r.label), [float(x) for x in v + rng.normal(0, scale, v.shape)])
            )
            truth[int(r.vec_id)].add(pid)
    planted = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    ).select(
        "vec_id", "label", F.col("embedding").cast("array<float>").alias("embedding")
    )
    corpus = emb.select("vec_id", "label", "embedding").unionByName(planted)
    got = {}
    for r in ivf_kmeans_topk(corpus, F.col("vec_id") < 3, k=5, nprobe=2).collect():
        got.setdefault(r.query_id, set()).add(r.cand_id)
    recalls = [len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth]
    assert min(recalls) >= 0.9, recalls


def test_dot_dec_null_element_not_misreported_as_overflow(spark):
    """r8 ADVICE: a NULL *element* inside a non-null array nulls the
    DECIMAL aggregate; that must propagate as a NULL dot (sparse-input
    contract violation for the caller to handle), NOT trip the
    overflow assert with a misleading DECIMAL-overflow message."""
    from dataframe_retail_e_inventarios_spark.operators.similarity import _dot_dec

    df = spark.createDataFrame(
        [
            ([1, 2, 3], [4, 5, 6], "dense"),
            ([1, None, 3], [4, 5, 6], "null_elem_left"),
            ([1, 2, 3], [4, None, 6], "null_elem_right"),
            (None, [4, 5, 6], "null_array"),
        ],
        "a array<bigint>, b array<bigint>, tag string",
    )
    rows = {
        r.tag: r.d
        for r in df.select(
            "tag", _dot_dec(F.col("a"), F.col("b")).alias("d")
        ).collect()
    }
    assert int(rows["dense"]) == 32
    assert rows["null_elem_left"] is None
    assert rows["null_elem_right"] is None
    assert rows["null_array"] is None


def test_planted_corpus_guards(spark):
    """r10 ADVICE: planted ids live at id_base + qid*100 + j, so a
    natural id >= id_base (or k >= 100) could collide with the planted
    id space and let the recall gate pass falsely. Both must raise —
    the id ceiling lazily in the plan (no extra corpus scan), k
    eagerly."""
    import pytest

    from dataframe_retail_e_inventarios_spark.operators.similarity import (
        planted_neighbors_corpus,
    )

    emb = spark.createDataFrame(
        [(i, i % 3, [float(i), 1.0]) for i in range(10)],
        "vec_id bigint, label int, embedding array<float>",
    )
    assert planted_neighbors_corpus(emb, n_queries=2, k=5).count() == 10 + 2 * 5

    with pytest.raises(ValueError, match="must be < 100"):
        planted_neighbors_corpus(emb, k=100)

    bad = emb.withColumn("vec_id", F.col("vec_id") + 100_000)
    with pytest.raises(Exception, match="collides with planted id space"):
        planted_neighbors_corpus(bad, n_queries=2, k=5).count()
