"""Differential and planted-case tests for the round-7 mining queries:
exact-substring overlap (positional-gram islands), the LSH banding
S-curve audit, the histogram quantile sketch, the TPC-H Q2-shaped
correlated min, and the PR/F1 threshold sweep."""

import hashlib
import re
from collections import defaultdict

import numpy as np
import pandas as pd

from conftest import SF_SMOKE

from dataframe_retail_e_inventarios_spark.plans.queries_mining import (
    _HQ_BINS,
    _HQ_QS,
    _PR_BINS,
    _PR_MARKERS,
    _SUB_MAX_DF,
    _SUB_MIN_RUN,
    _SUB_N,
    q_histogram_quantile_sketch,
    q_lsh_band_recall_audit,
    q_min_cost_supplier,
    q_pr_curve_quality,
    substring_overlap_pairs,
)

_MIX_K = 1_000_003
_MIX_M = 2_147_483_647


def _toks(text):
    return re.split(r"\s+", text.strip().lower())


def _h32(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _gram_hashes(text, n):
    hs = [_h32(t) for t in _toks(text)]
    out = []
    for i in range(len(hs) - n + 1):
        acc = hs[i]
        for j in range(1, n):
            acc = (acc % _MIX_M * _MIX_K + hs[i + j]) % _MIX_M
        out.append(acc)
    return out


def _brute_overlap(docs: pd.DataFrame, n, max_df, min_run):
    """Pure-python replay of substring_overlap_pairs."""
    grams = []  # (doc, pos, gh)
    for r in docs.itertuples():
        for pos, gh in enumerate(_gram_hashes(r.text, n)):
            grams.append((r.doc_id, pos, gh))
    by_gh = defaultdict(list)
    for d, p, gh in grams:
        by_gh[gh].append((d, p))
    out = defaultdict(set)  # (a, b) -> set of pos_a
    for gh, occ in by_gh.items():
        docs_in = {d for d, _ in occ}
        if not (2 <= len(docs_in) <= max_df):
            continue
        for da, pa in occ:
            for db, _pb in occ:
                if da < db:
                    out[(da, db)].add(pa)
    rows = []
    for (a, b), poss in out.items():
        ps = sorted(poss)
        runs, cur = [], 1
        for i in range(1, len(ps)):
            if ps[i] == ps[i - 1] + 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        longest = max(runs) + n - 1
        if longest >= min_run + n - 1:
            rows.append((a, b, len(ps), longest))
    return pd.DataFrame(
        rows, columns=["id_a", "id_b", "shared_grams", "longest_run_tokens"]
    ).sort_values(["id_a", "id_b"]).reset_index(drop=True)


def test_substring_overlap_matches_brute_force(spark):
    docs_pd = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    expect = _brute_overlap(docs_pd, _SUB_N, _SUB_MAX_DF, _SUB_MIN_RUN)
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    got = (
        substring_overlap_pairs(docs)
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert got.astype("int64").equals(expect.astype("int64")), (
        f"\ngot:\n{got}\nexpect:\n{expect}"
    )


def test_substring_overlap_planted_run(spark):
    """Two docs share exactly one 12-token passage -> one pair whose
    longest run is 12 tokens (5 grams of width 8); a third doc with
    no 8-token overlap stays out."""
    passage = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima"
    filler_a = "one two three four five six seven"
    filler_b = "red green blue cyan magenta yellow black"
    docs = spark.createDataFrame(
        [
            (1, f"{filler_a} {passage} {filler_b}"),
            (2, f"{filler_b} {passage} {filler_a}"),
            (3, f"{filler_a} {filler_b}"),
        ],
        "doc_id long, text string",
    )
    got = substring_overlap_pairs(docs).toPandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert (row.id_a, row.id_b) == (1, 2)
    assert row.longest_run_tokens == 12
    assert row.shared_grams == 5


def test_substring_overlap_df_cap_drops_boilerplate(spark):
    """A passage shared by MORE than max_df docs is boilerplate: its
    grams are df-capped out, so no pairs are emitted for it."""
    passage = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(i, f"pad{i} {passage} tail{i}") for i in range(5)],
        "doc_id long, text string",
    )
    got = substring_overlap_pairs(docs, max_df=3).toPandas()
    assert len(got) == 0


def test_lsh_band_recall_audit_properties(spark):
    out = (
        q_lsh_band_recall_audit(spark, SF_SMOKE)
        .toPandas()
        .sort_values("j_bin")
        .reset_index(drop=True)
    )
    assert len(out) >= 1
    assert (out.n_detected <= out.n_pairs).all()
    assert out.empirical_rate.between(0, 1).all()
    assert out.analytic_p.between(0, 1).all()
    # the analytic S-curve is monotone in the bin midpoint
    assert (out.analytic_p.diff().dropna() >= 0).all()
    # analytic values replay exactly: p = 1-(1-s^4)^4 at s = midpoint
    for r in out.itertuples():
        s = (r.j_bin + 0.5) / 10.0
        j4 = s * s * s * s
        m = 1.0 - j4
        assert abs(r.analytic_p - round(1.0 - m * m * m * m, 6)) < 1e-12


def test_histogram_quantile_sketch_matches_numpy(spark):
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    v = li.l_extendedprice.to_numpy()
    mn, mx, n = v.min(), v.max(), len(v)
    width = (mx - mn) / float(_HQ_BINS)
    bins = np.minimum(_HQ_BINS - 1, np.floor((v - mn) / width)).astype(int)
    cnt = np.bincount(bins, minlength=_HQ_BINS)
    cum = cnt.cumsum()
    out = q_histogram_quantile_sketch(spark, SF_SMOKE).toPandas()
    assert len(out) == len(_HQ_QS)
    for q in _HQ_QS:
        target = q * n
        k = int(np.searchsorted(cum, target))
        cum_prev = cum[k] - cnt[k]
        est = mn + width * (k + (target - cum_prev) / cnt[k])
        row = out[out.q == q].iloc[0]
        assert row.bin_id == k
        assert abs(row.est_value - round(est, 4)) < 1e-9
        # estimate is within one bin width of the true quantile
        true_q = np.quantile(v, q)
        assert abs(row.est_value - true_q) <= width + 1e-9
    # monotone: P50 <= P90 <= P99
    ordered = out.sort_values("q").est_value.to_numpy()
    assert (np.diff(ordered) >= 0).all()


def test_min_cost_supplier_matches_pandas(spark):
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    sup = pd.read_parquet(f"{SF_SMOKE}/supplier.parquet")
    nat = pd.read_parquet(f"{SF_SMOKE}/nation.parquet")
    li = li.assign(
        cents=(li.l_extendedprice * 100).round().astype("int64"),
        qty=li.l_quantity.astype("int64"),
    )
    per = (
        li.groupby(["l_partkey", "l_suppkey"])
        .agg(cents=("cents", "sum"), qty=("qty", "sum"), n_lines=("qty", "size"))
        .reset_index()
    )
    # exact integer half-even rounding to 4dp, as the query does
    num = per.cents * 100
    q0 = num // per.qty
    rem = num % per.qty
    tie_up = (q0 % 2 != 0).astype("int64")
    adj = np.where(rem * 2 > per.qty, 1, np.where(rem * 2 < per.qty, 0, tie_up))
    per["unit_cost"] = (q0 + adj) / 10000.0
    per["n_suppliers"] = per.groupby("l_partkey").l_suppkey.transform("size")
    best = (
        per.sort_values(["l_partkey", "unit_cost", "l_suppkey"])
        .groupby("l_partkey")
        .head(1)
    )
    best = best.merge(
        sup[["s_suppkey", "s_name", "s_nationkey"]],
        left_on="l_suppkey",
        right_on="s_suppkey",
    ).merge(nat[["n_nationkey", "n_name"]], left_on="s_nationkey", right_on="n_nationkey")
    got = (
        q_min_cost_supplier(spark, SF_SMOKE)
        .toPandas()
        .sort_values("partkey")
        .reset_index(drop=True)
    )
    expect = best.sort_values("l_partkey").reset_index(drop=True)
    assert got.partkey.equals(expect.l_partkey.astype("int64").rename("partkey"))
    assert got.best_suppkey.equals(
        expect.l_suppkey.astype("int64").rename("best_suppkey")
    )
    assert got.supplier_nation.equals(expect.n_name.rename("supplier_nation"))
    assert np.array_equal(got.unit_cost.to_numpy(), expect.unit_cost.to_numpy())
    assert got.n_suppliers.equals(
        expect.n_suppliers.astype("int64").rename("n_suppliers")
    )


def test_pr_curve_matches_pandas(spark):
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    rows = []
    for r in docs.itertuples():
        toks = _toks(r.text)
        score = (
            sum(1 for t in toks if t in _PR_MARKERS) / len(toks) if toks else 0.0
        )
        rows.append((min(_PR_BINS, int(np.floor(score * _PR_BINS))), r.lang == "en"))
    sc = pd.DataFrame(rows, columns=["bin", "pos"])
    total_pos = int(sc.pos.sum())
    got = (
        q_pr_curve_quality(spark, SF_SMOKE)
        .toPandas()
        .sort_values("thr")
        .reset_index(drop=True)
    )
    assert len(got) == _PR_BINS + 1
    for b in range(_PR_BINS + 1):
        sel = sc[sc.bin >= b]
        tp = int(sel.pos.sum())
        fp = int((~sel.pos).sum())
        row = got.iloc[b]
        assert row.tp == tp and row.fp == fp and row.fn == total_pos - tp
        p = tp / (tp + fp) if tp + fp else 0.0
        r_ = tp / total_pos if total_pos else 0.0
        f1 = 2 * p * r_ / (p + r_) if p + r_ > 0 else 0.0
        assert abs(row.precision - round(p, 4)) <= 1e-9
        assert abs(row.recall - round(r_, 4)) <= 1e-9
        assert abs(row.f1 - round(f1, 4)) <= 2e-4
    # recall is monotone non-increasing in the threshold
    assert (got.recall.diff().dropna() <= 1e-12).all()


def test_custdist_matches_pandas(spark):
    from dataframe_retail_e_inventarios_spark.plans.queries_mining import (
        q_custdist,
    )

    cust = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    per = orders.groupby("o_custkey").size()
    counts = cust.c_custkey.map(per).fillna(0).astype("int64")
    expect = (
        counts.value_counts().rename_axis("c_count").rename("custdist")
        .reset_index().sort_values("c_count").reset_index(drop=True)
    )
    got = (
        q_custdist(spark, SF_SMOKE).toPandas()
        .sort_values("c_count").reset_index(drop=True)
    )
    assert got.c_count.astype("int64").equals(expect.c_count.astype("int64"))
    assert got.custdist.astype("int64").equals(expect.custdist.astype("int64"))
    # every customer is represented exactly once
    assert got.custdist.sum() == len(cust)


def test_cohens_kappa_matches_sklearn_formula(spark):
    from dataframe_retail_e_inventarios_spark.plans.queries_mining import (
        q_cohens_kappa_langid,
    )
    from dataframe_retail_e_inventarios_spark.plans.queries_llm import (
        _LANG_MARKERS,
    )

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    preds = []
    for r in docs.itertuples():
        toks = _toks(r.text)
        pred, best = "unknown", 0
        for lang in ("en", "es", "de", "fr"):
            s = sum(1 for t in toks if t in _LANG_MARKERS[lang])
            if s > best:
                pred, best = lang, s
        preds.append((r.lang, pred))
    df = pd.DataFrame(preds, columns=["lab", "prd"])
    n = len(df)
    n_agree = int((df.lab == df.prd).sum())
    pe_num = int(
        sum(
            (df.lab == c).sum() * (df.prd == c).sum()
            for c in set(df.lab) | set(df.prd)
        )
    )
    got = q_cohens_kappa_langid(spark, SF_SMOKE).toPandas().iloc[0]
    assert got.n == n and got.n_agree == n_agree and got.pe_num == pe_num
    kappa = (n * n_agree - pe_num) / (n * n - pe_num)
    assert abs(got.kappa - round(kappa, 6)) < 1e-12
    # kappa <= po always; agreement above chance here
    assert got.kappa <= got.po + 1e-12


def test_semdedup_keep_decision_properties(spark):
    from dataframe_retail_e_inventarios_spark.plans.queries_mining import (
        _SEM_TAU,
        q_semdedup_keep_decision,
    )

    got = q_semdedup_keep_decision(spark, SF_SMOKE).toPandas()
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    # one decision per vector
    assert len(got) == len(emb)
    assert got.vec_id.is_unique
    # the minimum id can never be dropped (no smaller-id neighbor)
    assert bool(got[got.vec_id == got.vec_id.min()].kept.iloc[0])
    assert ((got.n_dup_smaller > 0) == ~got.kept).all()
    # dropped vectors really do have a smaller-id neighbor >= tau
    # (exact numpy verify on the dropped set)
    V = np.stack(emb.sort_values("vec_id").embedding.to_numpy())
    ids = emb.sort_values("vec_id").vec_id.to_numpy()
    norms = np.linalg.norm(V, axis=1)
    pos = {v: i for i, v in enumerate(ids)}
    dropped = got[~got.kept].vec_id.to_numpy()
    for v in dropped[:50]:
        i = pos[v]
        sims = (V[:i] @ V[i]) / (norms[:i] * norms[i])
        assert sims.size and sims.max() >= _SEM_TAU - 1e-9


def test_semdedup_plan_is_banded_not_allpairs(spark):
    """The SemDeDup candidate stage must be an equi-join on band_key —
    a regression to a cartesian/all-pairs plan would still pass the
    value oracle at test scale while being unrunnable at 100 TB."""
    from dataframe_retail_e_inventarios_spark.plans.queries_mining import (
        q_semdedup_keep_decision,
    )

    plan = (
        q_semdedup_keep_decision(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def _winnow_fps(text, k=5, w=4):
    import hashlib

    toks = _toks(text)
    hs = [int(hashlib.md5(t.encode()).hexdigest()[:8], 16) for t in toks]
    M, K = 2_147_483_647, 1_000_003
    grams = []
    for i in range(len(hs) - k + 1):
        acc = hs[i]
        for j in range(1, k):
            acc = (acc % M * K + hs[i + j]) % M
        grams.append(acc)
    if len(grams) < w:
        return set()
    return {min(grams[p : p + w]) for p in range(len(grams) - w + 1)}


def test_winnow_pairs_match_bruteforce(spark):
    from dataframe_retail_e_inventarios_spark.plans.queries_mining import (
        _WIN_MAX_DF,
        q_winnow_fingerprint_pairs,
    )

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    fps = {r.doc_id: _winnow_fps(r.text) for r in docs.itertuples()}
    # df-cap as the query applies it
    from collections import Counter

    df_count = Counter(f for s in fps.values() for f in s)
    ok = {f for f, c in df_count.items() if 2 <= c <= _WIN_MAX_DF}
    capped = {d: s & ok for d, s in fps.items()}
    ids = sorted(capped)
    expect = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            shared = len(capped[a] & capped[b])
            if shared >= 2:
                expect[(a, b)] = shared
    got = q_winnow_fingerprint_pairs(spark, SF_SMOKE).toPandas()
    got_pairs = {
        (r.id_a, r.id_b): r.shared_fp for r in got.itertuples()
    }
    assert got_pairs == expect
    for r in got.itertuples():
        assert r.n_fp_a == len(fps[r.id_a])
        assert r.n_fp_b == len(fps[r.id_b])
        assert r.fp_jaccard == r.shared_fp / (r.n_fp_a + r.n_fp_b - r.shared_fp)


def test_winnow_guarantee_on_planted_duplicates(spark):
    """Winnowing's contract: two docs sharing a contiguous run of
    >= w + k - 1 tokens share at least one fingerprint."""
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    b = "one two " + a + " three four"
    fa, fb = _winnow_fps(a), _winnow_fps(b)
    assert fa & fb
