"""End-to-end LLM curation pipeline (plans/queries_curation.py
llm_curation_pipeline): one-scan plan shape plus a pandas brute-force
differential of the full stage chain."""

import hashlib
import re
from collections import Counter

import pyspark.sql.functions as F

from dataframe_retail_e_inventarios_spark.plans.queries_curation import (
    _PIPE_BUDGET,
    _PIPE_EVAL_MOD,
    _PIPE_MIN_SHARED,
    _PIPE_Q_FLOOR,
    q_llm_curation_pipeline,
)
from dataframe_retail_e_inventarios_spark.operators.textops import STOPWORDS
from dataframe_retail_e_inventarios_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


def test_pipeline_single_documents_scan(spark):
    """The chain reads the documents parquet EXACTLY ONCE: the feature
    frame is checkpointed, so the eval-index branch, the keeper window,
    the decontamination join and the packer all consume materialized
    features — the final executed plan contains no parquet scan at
    all (r7 verdict #7: 'one documents scan feeding all stages')."""
    df = q_llm_curation_pipeline(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in plan
    # and nothing in the post-checkpoint dataflow is a cartesian join
    assert "CartesianProduct" not in plan


def test_pipeline_differential_vs_pandas(spark):
    """Brute-force re-derivation of every stage in plain Python over
    the smoke corpus; the Spark output must match exactly."""
    from dataframe_retail_e_inventarios_spark.operators.tokenize import (
        bpe_ish_tokens,
    )

    # n_tokens comes from the Spark expression itself: the BPE-ish
    # regex engine parity (Java <-> DuckDB) is already hash-gated by
    # the registered oracles; this differential re-derives the STAGE
    # LOGIC (filters, keeper, decontamination, packing) in Python.
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id",
        "lang",
        "text",
        F.size(bpe_ish_tokens("text")).cast("long").alias("n_bpe"),
    )
    rows = docs.collect()
    stop = set(STOPWORDS)

    feats = {}
    for r in rows:
        text = r.text
        toks = re.split(r"\s+", text.strip().lower())
        n = len(toks)
        q = (
            0.4 * min(1.0, n / 100.0)
            + 0.3 * (1 - (sum(t in stop for t in toks) / n if n else 0.0))
            + 0.3
            * (
                1
                - (
                    (len(text) - len(re.sub(r"[^\w\s]", "", text, flags=re.UNICODE)))
                    / len(text)
                    if len(text)
                    else 0.0
                )
            )
        )
        fp = hashlib.md5(
            re.sub(r"\s+", " ", text).strip().lower().encode()
        ).hexdigest()
        n_tokens = r.n_bpe
        sh = []
        if n >= 3:
            seen = set()
            for i in range(n - 2):
                s = " ".join(toks[i : i + 3])
                if s not in seen:
                    seen.add(s)
                    sh.append(s)
        # Multiset, not set: the engines explode per-doc DISTINCT
        # shingles to 32-bit hashes and count rows, so two distinct
        # shingles colliding to one hash contribute multiplicity 2.
        # A set here would merge them and diverge from both engines.
        hs = Counter(int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in sh)
        feats[r.doc_id] = (r.lang, q, fp, n_tokens, hs)

    ev_ids = [d for d in feats if d % _PIPE_EVAL_MOD == 0]
    # keeper among filtered train survivors
    surv, seen_fp = [], set()
    for d in sorted(feats):
        lang, q, fp, n_tokens, hs = feats[d]
        if d % _PIPE_EVAL_MOD == 0 or q < _PIPE_Q_FLOOR or lang != "en":
            continue
        if fp in seen_fp:
            continue
        seen_fp.add(fp)
        surv.append(d)
    # decontamination: >= MIN_SHARED shared shingle-hashes with ANY ONE
    # eval doc. Both engines join exploded hashes and count(*), so a
    # hash carried by a colliding shingles in the train doc and b in
    # the eval doc contributes a*b joined rows — mirror that product.
    def _n_shared(tr: Counter, ev: Counter) -> int:
        return sum(c * ev[h] for h, c in tr.items() if h in ev)

    clean = []
    for d in surv:
        hs = feats[d][4]
        contaminated = any(
            _n_shared(hs, feats[e][4]) >= _PIPE_MIN_SHARED for e in ev_ids
        )
        if not contaminated:
            clean.append(d)
    # pack
    want, before = {}, 0
    for d in sorted(clean):
        nt = feats[d][3]
        want[d] = (nt, before // _PIPE_BUDGET)
        before += nt

    got = {
        r.doc_id: (r.n_tokens, r.batch_id)
        for r in q_llm_curation_pipeline(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert len(got) > 0
