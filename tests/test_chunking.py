"""Chunking and sentence-splitting invariants (operators/chunking.py)."""

import pyspark.sql.functions as F

from dataframe_retail_e_inventarios_spark.operators.chunking import (
    chunk_documents,
    make_sentence_udtf,
    split_sentences_native,
)
from dataframe_retail_e_inventarios_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _tok_doc(n):
    return " ".join(f"t{i}" for i in range(1, n + 1))


def test_chunk_boundaries_and_tail_rule(spark):
    # 100 tokens, chunk=64, stride=48: starts 1, 49, 97. Chunk at 97
    # adds nothing beyond chunk at 49 (which already reaches token
    # 100), so exactly 2 chunks survive.
    out = (
        chunk_documents(_docs(spark, [(1, _tok_doc(100))]))
        .orderBy("chunk_no")
        .collect()
    )
    assert [r["chunk_no"] for r in out] == [0, 1]
    assert out[0]["n_tokens"] == 64
    assert out[0]["chunk_text"].startswith("t1 ") and out[0]["chunk_text"].endswith(" t64")
    assert out[1]["n_tokens"] == 52  # tokens 49..100
    assert out[1]["chunk_text"].startswith("t49 ") and out[1]["chunk_text"].endswith(" t100")


def test_no_strict_subset_chunks(spark):
    # 50 tokens: second start (49) would cover 49..50, a subset of
    # chunk 0 (1..50) — must be dropped.
    out = chunk_documents(_docs(spark, [(1, _tok_doc(50))])).collect()
    assert len(out) == 1 and out[0]["n_tokens"] == 50


def test_full_token_coverage(spark):
    # Every token of every doc appears in at least one chunk.
    for n in (1, 10, 64, 65, 112, 113, 200):
        chunks = chunk_documents(_docs(spark, [(1, _tok_doc(n))])).collect()
        covered = set()
        for r in chunks:
            covered.update(r["chunk_text"].split(" "))
        assert covered == {f"t{i}" for i in range(1, n + 1)}, n


def test_empty_and_whitespace_docs_dropped(spark):
    out = chunk_documents(_docs(spark, [(1, ""), (2, "   "), (3, "one")])).collect()
    assert [r["doc_id"] for r in out] == [3]


def test_sentence_split_native(spark):
    out = (
        split_sentences_native(
            _docs(spark, [(1, "First one. Second!  Third? trailing")])
        )
        .orderBy("sent_no")
        .collect()
    )
    assert [(r["sent_no"], r["sentence"]) for r in out] == [
        (0, "First one"),
        (1, "Second"),
        (2, "Third"),
        (3, "trailing"),
    ]


def test_sentence_udtf_matches_native(spark):
    spark.udtf.register("split_sentences_t", make_sentence_udtf())
    docs = load_table(spark, SF_SMOKE, "documents").limit(200)
    docs.createOrReplaceTempView("docs_udtf_test")
    via_udtf = spark.sql(
        "SELECT d.doc_id, s.sent_no, s.sentence "
        "FROM docs_udtf_test d, LATERAL split_sentences_t(d.text) s"
    )
    native = split_sentences_native(docs)
    assert via_udtf.count() == native.count() > 0
    assert via_udtf.exceptAll(native).count() == 0
    assert native.exceptAll(via_udtf).count() == 0


def test_chunks_plan_has_no_shuffle(spark):
    plan = (
        chunk_documents(load_table(spark, SF_SMOKE, "documents"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
