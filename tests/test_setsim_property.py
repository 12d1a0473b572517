"""Seeded randomized losslessness sweep for the PPJoin+ prefix join
(operators/dedup.setsim_prefix_pairs): on random corpora with planted
near-dups and adversarial length mixes, the pruned join must equal the
exact all-pairs Jaccard at EVERY threshold tried — the property the
length and positional filters must never break."""

import numpy as np

from dataframe_retail_e_inventarios_spark.operators.dedup import (
    jaccard_pairs,
    setsim_prefix_pairs,
)

RNG = np.random.default_rng(11)
VOCAB = [f"w{i}" for i in range(60)]


def _random_corpus(n_docs: int) -> list[tuple[int, str]]:
    docs = []
    for i in range(n_docs):
        n = int(RNG.integers(3, 40))
        words = list(RNG.choice(VOCAB, size=n))
        docs.append((i, " ".join(words)))
    # planted near-dups: copy with small edits (the pairs that MUST
    # survive pruning), including short/long length-mix adversaries
    # for the length filter boundary
    base = docs[0][1].split()
    docs.append((n_docs, " ".join(base + ["extra"])))
    docs.append((n_docs + 1, " ".join(base[: max(3, len(base) // 2)])))
    docs.append((n_docs + 2, docs[1][1]))  # exact duplicate
    return docs


def test_ppjoin_lossless_random_sweep(spark):
    for trial, threshold in [(0, 0.3), (1, 0.5), (2, 0.7), (3, 0.9)]:
        corpus = _random_corpus(30 + 5 * trial)
        df = spark.createDataFrame(corpus, "doc_id long, text string")
        got = {
            (r.id_a, r.id_b, r.jaccard)
            for r in setsim_prefix_pairs(df, threshold=threshold).collect()
        }
        want = {
            (r.id_a, r.id_b, r.jaccard)
            for r in jaccard_pairs(df, threshold=threshold).collect()
        }
        assert got == want, (
            f"PPJoin pruning dropped/added pairs at t={threshold}: "
            f"missing={want - got} extra={got - want}"
        )
        if threshold <= 0.5:
            assert want, "fixture degenerated: no true pairs to certify"
