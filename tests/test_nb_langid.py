"""Naive Bayes language classifier (nb_langid_confusion): the
train-with-aggregates exhibit. The oracle gate proves cross-engine
parity; these tests pin the SEMANTICS — resubstitution accuracy must
strictly beat the majority-class baseline (a self-trained NB that
learns nothing is a broken model, whatever the oracle says; the
synthetic corpus's langs share much vocabulary, so per-class majority
is NOT attainable and overall-beats-baseline is the honest floor),
rows must partition the scored docs, and the scaled
negative-log-likelihood pipeline must be deterministic across runs."""

import pyspark.sql.functions as F

from dataframe_retail_e_inventarios_spark.registry import queries
from dataframe_retail_e_inventarios_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


def test_nb_confusion_beats_baseline_and_partitions(spark):
    rows = queries()["nb_langid_confusion"](spark, SF_SMOKE).collect()
    assert rows, "empty confusion matrix"
    total = sum(r.n_docs for r in rows)
    correct = sum(r.n_docs for r in rows if r.true_lang == r.pred_lang)
    by_true: dict = {}
    for r in rows:
        by_true[r.true_lang] = by_true.get(r.true_lang, 0) + r.n_docs
    majority = max(by_true.values()) / total
    assert correct / total > majority, (correct, total, by_true)
    # rows partition exactly the docs long enough to carry a trigram
    docs = load_table(spark, SF_SMOKE, "documents")
    n_scored = docs.filter(F.length(F.lower(F.trim("text"))) >= 3).count()
    assert total == n_scored


def test_nb_confusion_deterministic(spark):
    q = queries()["nb_langid_confusion"]
    a = sorted(map(tuple, q(spark, SF_SMOKE).collect()))
    b = sorted(map(tuple, q(spark, SF_SMOKE).collect()))
    assert a == b
