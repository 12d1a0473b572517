"""Differential tests for the round-7 data-selection queries:
DSIR importance weighting (numpy brute force replays the hashed-bigram
log-ratio model) and per-source token-budget curation (pandas greedy
replay + budget-invariant properties)."""

import hashlib
import math
import re

import pandas as pd

from conftest import SF_SMOKE

_MIX_K = 1_000_003
_MIX_M = 2_147_483_647
_B = 4096


def _toks(text):
    return re.split(r"\s+", text.strip().lower())


def _h32(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_dsir_matches_numpy_brute_force(spark):
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    grams = []  # (doc_id, is_t, bucket)
    for r in docs.itertuples():
        hs = [_h32(t) for t in _toks(r.text)]
        if len(hs) < 2:
            continue
        is_t = r.lang == "en"
        for i in range(len(hs) - 1):
            gh = (hs[i] % _MIX_M * _MIX_K + hs[i + 1]) % _MIX_M
            grams.append((r.doc_id, is_t, gh % _B))
    g = pd.DataFrame(grams, columns=["doc_id", "is_t", "b"])
    nr, nt = len(g), int(g.is_t.sum())
    bc = g.groupby("b").agg(cr=("b", "size"), ct=("is_t", "sum"))
    lri = {
        b: round(
            (
                math.log(row.ct + 1)
                - math.log(nt + _B)
                - math.log(row.cr + 1)
                + math.log(nr + _B)
            )
            * 1e9
        )
        for b, row in bc.iterrows()
    }
    sc = (
        g.assign(lri=g.b.map(lri))
        .groupby("doc_id")
        .agg(n_grams=("b", "size"), s=("lri", "sum"))
        .reset_index()
    )
    sc["dsir_score"] = (sc.s / 1e9).round(6)
    order = sc.sort_values(["s", "doc_id"], ascending=[False, True])
    selected = set(order.doc_id.head(500))

    from dataframe_retail_e_inventarios_spark.plans.queries_curation import (
        q_dsir_importance_selection,
    )

    got = q_dsir_importance_selection(spark, SF_SMOKE).toPandas()
    exp = sc.set_index("doc_id")
    assert len(got) == len(exp)
    for r in got.itertuples():
        e = exp.loc[r.doc_id]
        assert r.n_grams == e.n_grams, r.doc_id
        assert abs(r.dsir_score - e.dsir_score) < 1e-9, r.doc_id
        assert r.selected == (r.doc_id in selected), r.doc_id


def test_token_budget_greedy_replay_and_invariants(spark):
    from dataframe_retail_e_inventarios_spark.operators.textops import STOPWORDS
    from dataframe_retail_e_inventarios_spark.plans.queries_curation import (
        _TOKEN_BUDGET,
        q_token_budget_selection,
    )

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    stop = set(STOPWORDS)
    rows = []
    for r in docs.itertuples():
        t = _toks(r.text)
        n = len(t)
        s = sum(1 for x in t if x in stop)
        qi = (s * 1_000_000) // n if n > 0 else 0
        rows.append((r.source, r.doc_id, n, qi))
    base = pd.DataFrame(rows, columns=["source", "doc_id", "n_tokens", "qi"])
    expect = {}
    for src, grp in base.groupby("source"):
        cum = 0
        for r in grp.sort_values(["qi", "doc_id"], ascending=[False, True]).itertuples():
            cum += r.n_tokens
            if cum > _TOKEN_BUDGET:
                break
            expect[r.doc_id] = cum

    got = q_token_budget_selection(spark, SF_SMOKE).toPandas()
    assert set(got.doc_id) == set(expect)
    for r in got.itertuples():
        assert r.cum_tokens == expect[r.doc_id], r.doc_id
    # budget invariant: per-source selected token mass never exceeds it
    per_src = got.groupby("source").n_tokens.sum()
    assert (per_src <= _TOKEN_BUDGET).all()


def test_source_score_calibration_deciles(spark):
    """Every source lands ~10 deciles covering all its docs; decile
    edges are monotone (lo/hi ranges don't overlap across deciles
    within a source)."""
    import pyspark.sql.functions as F

    from dataframe_retail_e_inventarios_spark.registry import queries
    from tests.conftest import SF_SMOKE

    rows = queries()["source_score_calibration"](spark, SF_SMOKE).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    assert len(by_src) == 20
    for src, rs in by_src.items():
        rs = sorted(rs, key=lambda r: r.decile)
        assert sum(r.n_docs for r in rs) == 25
        assert rs[0].decile == 0 and rs[-1].decile <= 9
        for a, b in zip(rs, rs[1:]):
            assert a.hi_qi <= b.lo_qi, f"decile ranges overlap in {src}"
