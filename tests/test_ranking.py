"""BM25 scoring invariants (operators/ranking.py)."""

import pyspark.sql.functions as F

from dataframe_retail_e_inventarios_spark.operators.ranking import bm25_scores


def _scores(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = bm25_scores(df).collect()
    return {(r["doc_id"], r["term"]): r for r in rows}


CORPUS = [
    (1, "apple banana banana cherry"),
    (2, "apple durian durian durian"),
    (3, "apple elderberry fig"),
    (4, "apple grape"),
]


def test_rare_term_outranks_ubiquitous_term(spark):
    s = _scores(spark, CORPUS)
    # "elderberry" (df=1) must beat "apple" (df=4, in every doc) for doc 3.
    assert s[(3, "elderberry")]["score"] > s[(3, "apple")]["score"]


def test_df_and_tf_bookkeeping(spark):
    s = _scores(spark, CORPUS)
    assert s[(1, "banana")]["tf"] == 2
    assert s[(2, "durian")]["df"] == 1
    assert all(r["df"] == 4 for (d, t), r in s.items() if t == "apple")


def test_tf_saturation_monotone_but_sublinear(spark):
    # Same doc length, higher tf ⇒ higher score, but less than linear.
    docs = [
        (1, "x a b c"),
        (2, "x x a b"),
        (3, "x x x a"),
    ]
    s = _scores(spark, docs)
    s1, s2, s3 = (s[(i, "x")]["score"] for i in (1, 2, 3))
    assert s1 < s2 < s3
    assert (s3 - s2) < (s2 - s1)


def test_hashed_vectors_l1_normalized_and_bounded(spark):
    from dataframe_retail_e_inventarios_spark.operators.ranking import (
        HASH_DIM,
        hashed_doc_vectors,
    )

    df = spark.createDataFrame(
        [(1, "a b c a"), (2, "x"), (3, "")], "doc_id long, text string"
    )
    out = hashed_doc_vectors(df).collect()
    assert all(0 <= r["bucket"] < HASH_DIM for r in out)
    sums = {}
    for r in out:
        sums[r["doc_id"]] = sums.get(r["doc_id"], 0.0) + r["weight"]
    assert set(sums) == {1, 2}  # empty doc contributes nothing
    for s in sums.values():
        assert abs(s - 1.0) < 1e-5  # L1-normalized
    # doc 2 has one token -> one bucket with weight 1.0
    assert [r["weight"] for r in out if r["doc_id"] == 2] == [1.0]


def test_scores_positive_and_empty_docs_dropped(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "   "), (3, "")], "doc_id long, text string"
    )
    out = bm25_scores(df)
    assert out.filter(F.col("score") <= 0).count() == 0
    assert out.filter(F.col("doc_id").isin(2, 3)).count() == 0
