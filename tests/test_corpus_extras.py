"""Unit tests for the bigram-LM fluency scorer and the rolling
active-user engagement rollup."""

import pyspark.sql.functions as F

from dataframe_retail_e_inventarios_spark.plans.queries_corpus import (
    q_bigram_logprob_scores,
)
from dataframe_retail_e_inventarios_spark.plans.queries_warehouse import (
    q_rolling_active_users,
)

from conftest import SF_SMOKE


class TestBigramScores:
    def test_corpus_scores_bounded(self, spark):
        rows = q_bigram_logprob_scores(spark, SF_SMOKE).collect()
        assert len(rows) > 0
        for r in rows:
            assert r.n_bigrams >= 1
            assert r.avg_neg_logprob > 0.0

    def test_common_patterns_score_lower(self, spark):
        """A doc made of the corpus' most common bigrams must score
        (strictly) more fluent than a doc of one-off bigrams."""
        docs = spark.createDataFrame(
            # doc 1+2 repeat the same bigrams heavily (high counts),
            # doc 3 is all unique transitions
            [
                (1, "a b a b a b a b"),
                (2, "a b a b a b a b"),
                (3, "q w e r t y u i"),
            ],
            "doc_id long, text string",
        )
        import dataframe_retail_e_inventarios_spark.plans.queries_corpus as qc
        from dataframe_retail_e_inventarios_spark.sources import readers

        # score via the same pipeline, monkey-patched source
        orig = readers.load_table
        try:
            readers.load_table = lambda s, d, t: docs
            qc.load_table = readers.load_table
            scored = {r.doc_id: r.avg_neg_logprob for r in q_bigram_logprob_scores(spark, SF_SMOKE).collect()}
        finally:
            readers.load_table = orig
            qc.load_table = orig
        assert scored[1] < scored[3]
        assert scored[1] == scored[2]


class TestRollingActiveUsers:
    def test_nesting_invariant(self, spark):
        """DAU ⊆ WAU ⊆ MAU per day, and WAU is monotone vs DAU sums."""
        rows = q_rolling_active_users(spark, SF_SMOKE).collect()
        assert len(rows) > 0
        for r in rows:
            assert r.dau <= r.wau <= r.mau

    def test_first_day_equal(self, spark):
        """On the first day of history, DAU == WAU == MAU."""
        rows = sorted(
            q_rolling_active_users(spark, SF_SMOKE).collect(),
            key=lambda r: r.epoch_day,
        )
        first = rows[0]
        assert first.dau == first.wau == first.mau


def test_phrase_search_matches_brute_force(spark):
    import re

    from dataframe_retail_e_inventarios_spark.plans.queries_corpus import (
        _PHRASES,
        q_phrase_search_positional,
    )
    from dataframe_retail_e_inventarios_spark.sources.readers import load_table
    from conftest import SF_SMOKE

    out = {
        r.phrase: (r.n_docs, r.n_occurrences)
        for r in q_phrase_search_positional(spark, SF_SMOKE).collect()
    }
    docs = load_table(spark, SF_SMOKE, "documents").select("text").toPandas()
    manual = {}
    for w1, w2 in _PHRASES:
        nd = no = 0
        for t in docs["text"]:
            toks = re.split(r"\s+", t.lower().strip())
            c = sum(
                1
                for i in range(len(toks) - 1)
                if toks[i] == w1 and toks[i + 1] == w2
            )
            nd += c > 0
            no += c
        manual[f"{w1} {w2}"] = (nd, no)
    assert out == {k: v for k, v in manual.items() if k in out}
    # every registered phrase must appear (the fixture vocabulary
    # contains all of them)
    assert set(out) == set(manual)
