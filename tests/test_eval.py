"""Model-evaluation family (plans/queries_eval.py): each query checked
against an INDEPENDENT reimplementation (pandas/numpy brute force) on
the smoke fixture — different algorithm, same numbers — plus the
structural invariants the closed forms must satisfy."""

import math

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from dataframe_retail_e_inventarios_spark.plans.queries_eval import (
    _EN_MARKERS,
    _KS_BIN_CENTS,
    _RRF_CANDIDATES,
    _RRF_K,
    _RRF_TOP,
    q_calibration_bins_brier,
    q_gini_revenue_by_nation,
    q_ks_price_segments,
    q_reciprocal_rank_fusion,
    q_roc_auc_langid,
    q_spearman_qty_discount,
)
from dataframe_retail_e_inventarios_spark.sources.readers import load_table

from conftest import SF_SMOKE


def test_roc_auc_matches_brute_force_pairs(spark):
    row = q_roc_auc_langid(spark, SF_SMOKE).collect()[0]
    docs = load_table(spark, SF_SMOKE, "documents").select("text", "lang").toPandas()
    toks = docs["text"].str.lower().str.strip().str.split(r"\s+")
    score = toks.map(lambda ts: sum(t in _EN_MARKERS for t in ts)).to_numpy()
    y = (docs["lang"] == "en").to_numpy()
    pos, neg = score[y], score[~y]
    # O(P*N) literal pair count — the definition, not the rank-sum form
    wins = (pos[:, None] > neg[None, :]).sum()
    ties = (pos[:, None] == neg[None, :]).sum()
    auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert row.n_pos == len(pos) and row.n_neg == len(neg)
    # query output is rounded to 6dp; the brute-force pair count is exact
    assert abs(row.auc - auc) < 5e-7
    assert abs(row.gini_coef - (2 * auc - 1)) < 1e-6
    assert 0.0 <= row.auc <= 1.0


def test_calibration_brier_decomposition(spark):
    rows = q_calibration_bins_brier(spark, SF_SMOKE).collect()
    assert [r.p_pred for r in rows] == sorted(r.p_pred for r in rows)
    for r in rows:
        # per-bin Brier decomposes exactly: gap^2 + rate*(1-rate)
        expect = r.calib_gap**2 + r.obs_rate * (1 - r.obs_rate)
        assert abs(r.brier - expect) < 1e-5
        assert 0.0 <= r.obs_rate <= 1.0
        assert r.n_pos <= r.n_obs


def test_spearman_matches_pandas_rank_corr(spark):
    out = {r.brand: r for r in q_spearman_qty_discount(spark, SF_SMOKE).collect()}
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_partkey", "l_quantity", "l_discount"
    )
    part = load_table(spark, SF_SMOKE, "part").select("p_partkey", "p_brand")
    pdf = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select(
            F.col("p_brand").alias("brand"),
            F.col("l_quantity").cast("long").alias("q"),
            F.bround(F.col("l_discount") * 100, 0).cast("long").alias("d"),
        )
        .toPandas()
    )
    for brand, g in pdf.groupby("brand"):
        rq = g["q"].rank(method="average")
        rd = g["d"].rank(method="average")
        rho = np.corrcoef(rq, rd)[0, 1]
        assert abs(out[brand].spearman_rho - rho) < 1e-6, brand
        assert out[brand].n == len(g)


def test_ks_matches_manual_ecdf(spark):
    rows = q_ks_price_segments(spark, SF_SMOKE).collect()
    assert len(rows) == 10  # C(5,2) segment pairs
    cust = load_table(spark, SF_SMOKE, "customer").toPandas()
    orders = load_table(spark, SF_SMOKE, "orders").toPandas()
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    cents = np.round(j["o_totalprice"].to_numpy() * 100).astype(np.int64)
    j["bin"] = cents // _KS_BIN_CENTS
    bins = np.arange(j["bin"].max() + 1)
    for r in rows:
        da = j.loc[j["c_mktsegment"] == r.seg_a, "bin"]
        db = j.loc[j["c_mktsegment"] == r.seg_b, "bin"]
        cdf_a = np.searchsorted(np.sort(da), bins, side="right") / len(da)
        cdf_b = np.searchsorted(np.sort(db), bins, side="right") / len(db)
        ks = np.abs(cdf_a - cdf_b).max()
        assert abs(r.ks_stat - ks) < 1e-6, (r.seg_a, r.seg_b)
        assert r.n_a == len(da) and r.n_b == len(db)


def test_rrf_formula_and_topk_shape(spark):
    rows = q_reciprocal_rank_fusion(spark, SF_SMOKE).collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for source, rs in by_source.items():
        assert [r.fused_rank for r in rs] == list(range(1, _RRF_TOP + 1)), source
        scores = [r.rrf_score for r in rs]
        assert scores == sorted(scores, reverse=True)
        for r in rs:
            expect = 0.0
            if r.rank_tok is not None:
                assert 1 <= r.rank_tok <= _RRF_CANDIDATES
                expect += 1.0 / (_RRF_K + r.rank_tok)
            if r.rank_len is not None:
                assert 1 <= r.rank_len <= _RRF_CANDIDATES
                expect += 1.0 / (_RRF_K + r.rank_len)
            assert abs(r.rrf_score - expect) < 1e-6


def test_gini_matches_manual_lorenz(spark):
    rows = q_gini_revenue_by_nation(spark, SF_SMOKE).collect()
    cust = load_table(spark, SF_SMOKE, "customer").toPandas()
    orders = load_table(spark, SF_SMOKE, "orders").toPandas()
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = np.round(j["o_totalprice"].to_numpy() * 100).astype(np.int64)
    rev = j.groupby(["c_nationkey", "c_custkey"])["cents"].sum().reset_index()
    nation = load_table(spark, SF_SMOKE, "nation").toPandas()
    names = dict(zip(nation["n_nationkey"], nation["n_name"]))
    manual = {}
    for nk, g in rev.groupby("c_nationkey"):
        x = np.sort(g["cents"].to_numpy())
        n = len(x)
        i = np.arange(1, n + 1, dtype=np.float64)
        manual[names[nk]] = (
            (2.0 * float((i * x).sum()) - (n + 1.0) * float(x.sum()))
            / (n * float(x.sum())),
            n,
        )
    assert len(rows) == len(manual)
    for r in rows:
        g, n = manual[r.nation]
        assert r.n_customers == n
        # query output is rounded to 6dp
        assert abs(r.gini - g) < 5e-7, r.nation
        assert 0.0 <= r.gini < 1.0
    # sanity: revenue concentration exists but is moderate on TPC-H-ish
    # uniform order totals
    assert any(r.gini > 0.1 for r in rows)


def test_gini_partitioning_invariance(spark):
    """The distributed rank must give identical Gini under a hostile
    partition count (ties broken by custkey make the order total)."""
    base = {
        r.nation: r.gini for r in q_gini_revenue_by_nation(spark, SF_SMOKE).collect()
    }
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        alt = {
            r.nation: r.gini
            for r in q_gini_revenue_by_nation(spark, SF_SMOKE).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == alt


def test_auc_of_perfect_and_random_split(spark):
    """Degenerate-input checks of the rank-sum machinery itself:
    a score equal to the label gives AUC 1 - tie-term only at equal
    scores; a constant score gives exactly 0.5 (all ties)."""
    df = spark.createDataFrame(
        [(1, 1), (2, 1), (0, 0), (0, 1), (1, 0)], "s long, y long"
    )
    per = df.groupBy("s").agg(
        F.sum("y").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("y")).alias("n_neg"),
    )
    from dataframe_retail_e_inventarios_spark.operators.prefix import (
        exclusive_prefix_offsets,
    )

    cum = exclusive_prefix_offsets(per, "s", "n_neg", "cum")
    j = per.join(cum, "s")
    u2 = j.agg(
        F.sum(
            F.col("n_pos") * (F.lit(2) * F.col("cum") + F.col("n_neg"))
        ).alias("u2")
    ).collect()[0].u2
    # pairs: pos scores {1,2,0}, neg {0,1}: wins = (1>0)+(2>0)+(2>1)=3,
    # ties = (1,1),(0,0) = 2 -> U2 = 2*3+2 = 8, AUC = 8/12
    assert u2 == 8
    const = spark.createDataFrame([(7, 1), (7, 0), (7, 1)], "s long, y long")
    perc = const.groupBy("s").agg(
        F.sum("y").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("y")).alias("n_neg"),
    )
    cumc = exclusive_prefix_offsets(perc, "s", "n_neg", "cum")
    u2c = (
        perc.join(cumc, "s")
        .agg(
            F.sum(
                F.col("n_pos") * (F.lit(2) * F.col("cum") + F.col("n_neg"))
            ).alias("u2")
        )
        .collect()[0]
        .u2
    )
    assert u2c == 2 * 1  # 2 pos * 1 neg, all tied -> U2 = P*N
    assert u2c / (2 * 2 * 1) == 0.5


def test_ks_identical_distribution_is_zero(spark):
    """KS of a segment against itself must be 0 — run the pair logic on
    a duplicated frame."""
    df = spark.createDataFrame(
        [("A", i % 7) for i in range(50)] + [("B", i % 7) for i in range(50)],
        "seg string, bin long",
    )
    binned = df.groupBy("seg", "bin").agg(F.count(F.lit(1)).alias("cnt"))
    from pyspark.sql import Window

    w = Window.partitionBy("seg").orderBy("bin")
    cdf = binned.select("seg", "bin", F.sum("cnt").over(w).alias("cum"))
    pair = (
        cdf.alias("a")
        .join(
            cdf.alias("b"),
            (F.col("a.seg") < F.col("b.seg")) & (F.col("a.bin") == F.col("b.bin")),
        )
        .agg(F.max(F.abs(F.col("a.cum") - F.col("b.cum"))).alias("sup"))
        .collect()[0]
    )
    assert pair.sup == 0


def test_rrf_plan_uses_window_group_limit(spark):
    """The rank<=k candidate filters must compile to WindowGroupLimit
    (per-partition top-k BEFORE the rank shuffle) — the property that
    makes the fusion bounded-candidate at scale."""
    plan = (
        q_reciprocal_rank_fusion(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one partial + one final per window spec (tok, len, fused) = 6
    assert plan.count("WindowGroupLimit") >= 6


def test_spearman_perfect_monotone_is_one(spark):
    """rho on a strictly increasing relationship = exactly 1 through
    the bounded-domain rank path (brand fixed)."""
    rows = [("B", q, q * 2) for q in range(1, 11)]
    df = spark.createDataFrame(rows, "brand string, q long, d long")
    joint = df.groupBy("brand", "q", "d").agg(F.count(F.lit(1)).alias("n_qd"))
    pdf = joint.toPandas()
    rq = pdf["q"].rank(method="average")
    rd = pdf["d"].rank(method="average")
    assert math.isclose(np.corrcoef(rq, rd)[0, 1], 1.0)


def test_conformal_properties_and_manual_series(spark):
    from dataframe_retail_e_inventarios_spark.plans.queries_eval import (
        q_conformal_forecast_intervals,
    )
    from dataframe_retail_e_inventarios_spark.operators.cleaning import clean_sales
    from dataframe_retail_e_inventarios_spark.operators.resample import (
        weekly_dense_resample,
    )
    from dataframe_retail_e_inventarios_spark.plans.flagship import KEYS

    rows = q_conformal_forecast_intervals(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.n_cal >= 10
        assert r.n_test == 4
        assert 0 <= r.n_covered <= r.n_test
        assert abs(r.coverage - r.n_covered / r.n_test) < 1e-9
        assert r.q_hat >= 0.0
    # split-conformal at alpha=0.1 should cover well on average (the
    # guarantee is marginal >= 0.9 under exchangeability; allow slack
    # on a short 4-week test window)
    mean_cov = sum(r.n_covered for r in rows) / sum(r.n_test for r in rows)
    assert mean_cov > 0.7
    # manual recomputation for the first series via pandas
    dense = (
        weekly_dense_resample(
            clean_sales(
                __import__(
                    "dataframe_retail_e_inventarios_spark.sources.readers",
                    fromlist=["load_table"],
                ).load_table(spark, SF_SMOKE, "lineitem")
            ),
            KEYS,
            "invoice_date",
            "units_sold",
        )
        .where(
            (F.col(KEYS[0]) == rows[0][KEYS[0]])
            & (F.col(KEYS[1]) == rows[0][KEYS[1]])
        )
        .orderBy("week")
        .toPandas()
    )
    u = np.round(dense["units_sold"].to_numpy()).astype(np.int64)
    diffs = [
        abs(4 * u[t] - u[t - 4 : t].sum()) for t in range(4, len(u))
    ]  # idx>=5 (1-based) == t>=4 (0-based)
    cal, test = diffs[:-4], diffs[-4:]
    k = (9 * (len(cal) + 1) + 9) // 10
    q_hat = sorted(cal)[k - 1]
    assert rows[0].n_cal == len(cal)
    assert abs(rows[0].q_hat - q_hat / 4.0) < 1e-9
    assert rows[0].n_covered == sum(x <= q_hat for x in test)


def test_mase_manual_series(spark):
    from dataframe_retail_e_inventarios_spark.operators.cleaning import clean_sales
    from dataframe_retail_e_inventarios_spark.operators.resample import (
        weekly_dense_resample,
    )
    from dataframe_retail_e_inventarios_spark.plans.flagship import KEYS
    from dataframe_retail_e_inventarios_spark.plans.queries_eval import (
        q_backtest_mase,
    )

    rows = q_backtest_mase(spark, SF_SMOKE).collect()
    assert rows
    r0 = rows[0]
    assert all(r.n_test == 4 and r.n_train >= 10 and r.mase >= 0.0 for r in rows)
    dense = (
        weekly_dense_resample(
            clean_sales(load_table(spark, SF_SMOKE, "lineitem")),
            KEYS,
            "invoice_date",
            "units_sold",
        )
        .where((F.col(KEYS[0]) == r0[KEYS[0]]) & (F.col(KEYS[1]) == r0[KEYS[1]]))
        .orderBy("week")
        .toPandas()
    )
    u = np.round(dense["units_sold"].to_numpy()).astype(np.int64)
    nw = len(u)
    test_idx = range(nw - 4, nw)
    train_idx = range(1, nw - 4)
    num = sum(abs(4 * u[t] - u[t - 4 : t].sum()) for t in test_idx)
    den = sum(abs(int(u[t]) - int(u[t - 1])) for t in train_idx)
    mase = (num * len(train_idx)) / (4 * den * 4)
    assert r0.n_train == len(train_idx)
    assert abs(r0.mase - mase) < 5e-7


def test_silhouette_matches_numpy_and_bounds(spark):
    from dataframe_retail_e_inventarios_spark.plans.queries_eval import (
        q_silhouette_lite_labels,
    )

    out = {r.label: r for r in q_silhouette_lite_labels(spark, SF_SMOKE).collect()}
    emb = load_table(spark, SF_SMOKE, "embeddings").toPandas()
    # independent reimplementation on snapped integers
    M = np.array(
        [np.round(np.round(np.asarray(v, dtype=np.float64), 6) * 1e6) for v in emb["embedding"]],
        dtype=np.int64,
    )
    labels = emb["label"].to_numpy()
    cents = {}
    for lb in np.unique(labels):
        s = M[labels == lb].sum(axis=0)
        n = (labels == lb).sum()
        cents[lb] = (s - np.mod(s, n)) // n  # exact floor-div mean
    sil_sum: dict = {}
    for i in range(len(M)):
        d2 = {lb: int(((M[i] - c) ** 2).sum()) for lb, c in cents.items()}
        a2 = d2[labels[i]]
        b2 = min(v for lb, v in d2.items() if lb != labels[i])
        mx = max(a2, b2)
        s = 0 if mx == 0 else np.round((b2 - a2) / mx * 1e9)
        sil_sum.setdefault(labels[i], []).append(int(s))
    for lb, ss in sil_sum.items():
        r = out[lb]
        assert r.n_vecs == len(ss)
        assert abs(r.mean_silhouette - sum(ss) / len(ss) / 1e9) < 5e-7, lb
        assert -1.0 <= r.mean_silhouette <= 1.0
        assert r.n_negative == sum(s < 0 for s in ss)


def test_event_trigrams_bounded_and_normalized(spark):
    from dataframe_retail_e_inventarios_spark.registry import queries

    rows = queries()["event_path_trigrams"](spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 125  # |event types|^3 bound
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-3
    assert all(r.n >= 1 for r in rows)
    assert [r.path for r in rows] == sorted(r.path for r in rows)


def test_apriori_pruning_is_lossless_vs_bruteforce(spark):
    """The engine's frequent-item-projected path must equal the direct
    unpruned triple enumeration (itertools on collected baskets)."""
    from itertools import combinations

    from dataframe_retail_e_inventarios_spark.plans.queries_scale import (
        _TRIPLE_MIN_SUP,
        q_apriori_triple_itemsets,
    )

    out = {
        (r.p1, r.p2, r.p3): r.support
        for r in q_apriori_triple_itemsets(spark, SF_SMOKE).collect()
    }
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, SF_SMOKE, "part").select("p_partkey", "p_brand")
    op = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select("l_orderkey", F.col("p_brand").alias("item"))
        .distinct()
        .toPandas()
    )
    counts: dict = {}
    for _, basket in op.groupby("l_orderkey")["item"]:
        for t in combinations(sorted(basket), 3):
            counts[t] = counts.get(t, 0) + 1
    manual = {t: c for t, c in counts.items() if c >= _TRIPLE_MIN_SUP}
    assert out == manual
    assert out  # non-trivial at the smoke scale


def test_jsd_matrix_properties(spark):
    import math as _math

    from dataframe_retail_e_inventarios_spark.plans.queries_corpus import (
        q_source_jsd_matrix,
    )

    rows = q_source_jsd_matrix(spark, SF_SMOKE).collect()
    assert len(rows) == 190  # C(20, 2) source pairs
    for r in rows:
        assert r.source_a < r.source_b
        # JSD is bounded by ln 2 and non-negative (tiny tolerance for
        # the 1e-9 per-term snap)
        assert -1e-6 <= r.jsd_nats <= _math.log(2) + 1e-6


def test_reconciliation_coherence_and_manual_brand(spark):
    """Top-down disaggregation is coherent BY CONSTRUCTION: the sum of
    product forecasts equals the brand forecast (sum of shares = 1).
    Verify the share identity and recompute one brand's MAE by hand."""
    from dataframe_retail_e_inventarios_spark.operators.cleaning import clean_sales
    from dataframe_retail_e_inventarios_spark.operators.resample import (
        weekly_dense_resample,
        weekly_resample_sum,
    )
    from dataframe_retail_e_inventarios_spark.plans.queries_eval import (
        q_forecast_reconciliation_topdown,
    )

    rows = {
        r.brand: r
        for r in q_forecast_reconciliation_topdown(spark, SF_SMOKE).collect()
    }
    assert rows
    brand = sorted(rows)[0]
    li = clean_sales(load_table(spark, SF_SMOKE, "lineitem"))
    part = load_table(spark, SF_SMOKE, "part").select("p_partkey", "p_brand")
    sales = li.join(part, li.product_id == part.p_partkey).select(
        F.col("p_brand").alias("brand"), "product_id", "invoice_date", "units_sold"
    )
    bw = (
        weekly_dense_resample(
            sales.where(F.col("brand") == brand), ["brand"], "invoice_date", "units_sold"
        )
        .orderBy("week")
        .toPandas()
    )
    ub = np.round(bw["units_sold"].to_numpy()).astype(np.int64)
    weeks = bw["week"].tolist()
    nw = len(ub)
    train_weeks = set(weeks[: nw - 4])
    test_pos = range(nw - 4, nw)
    t_brand = int(ub[: nw - 4].sum())
    pw = (
        weekly_resample_sum(
            sales.where(F.col("brand") == brand),
            ["brand", "product_id"],
            "invoice_date",
            "units_sold",
        )
        .toPandas()
    )
    pw["up"] = np.round(pw["units_sold"].to_numpy()).astype(np.int64)
    t_prod = (
        pw[pw["week"].isin(train_weeks)].groupby("product_id")["up"].sum()
    )
    t_prod = t_prod[t_prod > 0]
    # coherence: shares sum to 1 exactly in rational terms
    assert int(t_prod.sum()) <= t_brand  # products subset of brand total
    sum_r = 0
    n_terms = 0
    for t in test_pos:
        s4 = int(ub[t - 4 : t].sum())
        wk = weeks[t]
        actual = pw[pw["week"] == wk].set_index("product_id")["up"]
        for pid, tp in t_prod.items():
            y = int(actual.get(pid, 0))
            sum_r += abs(4 * t_brand * y - s4 * int(tp))
            n_terms += 1
    mae = sum_r / (4 * t_brand * n_terms)
    r = rows[brand]
    assert r.n_products == len(t_prod)
    assert r.train_units == t_brand
    assert abs(r.mae_topdown - mae) < 5e-7


def test_ols_two_factor_matches_numpy_lstsq(spark):
    from dataframe_retail_e_inventarios_spark.operators.cleaning import clean_sales
    from dataframe_retail_e_inventarios_spark.operators.resample import (
        weekly_dense_resample,
    )
    from dataframe_retail_e_inventarios_spark.plans.queries_eval import (
        q_ols_two_factor_demand,
    )

    out = {r.brand: r for r in q_ols_two_factor_demand(spark, SF_SMOKE).collect()}
    assert out
    li = clean_sales(load_table(spark, SF_SMOKE, "lineitem"))
    part = load_table(spark, SF_SMOKE, "part").select("p_partkey", "p_brand")
    sales = li.join(part, li.product_id == part.p_partkey).select(
        F.col("p_brand").alias("brand"), "invoice_date", "units_sold"
    )
    for brand in list(out)[:3]:
        bw = (
            weekly_dense_resample(
                sales.where(F.col("brand") == brand),
                ["brand"],
                "invoice_date",
                "units_sold",
            )
            .orderBy("week")
            .toPandas()
        )
        y = np.round(bw["units_sold"].to_numpy())
        x1 = np.arange(1, len(y) + 1, dtype=np.float64)
        x2 = (pd.to_datetime(bw["week"]).dt.month.isin([11, 12])).to_numpy(float)
        X = np.column_stack([np.ones_like(x1), x1, x2])
        beta, *_ = np.linalg.lstsq(X, y, rcond=None)
        resid = y - X @ beta
        r2 = 1 - (resid**2).sum() / ((y - y.mean()) ** 2).sum()
        r = out[brand]
        assert abs(r.beta_trend - beta[1]) < 1e-4, brand
        assert abs(r.beta_holiday - beta[2]) < 1e-3, brand
        assert abs(r.r_squared - r2) < 1e-4, brand
        assert r.n_weeks == len(y)


def test_association_rules_consistency(spark):
    """Rules must be pairwise-consistent: both directions share support
    and lift; confidence * supp(antecedent) == support (exact up to
    4dp scaling)."""
    from dataframe_retail_e_inventarios_spark.registry import queries

    rows = queries()["association_rules"](spark, SF_SMOKE).collect()
    assert rows
    by_pair = {}
    for r in rows:
        assert 0.0 < r.confidence <= 1.0
        key = tuple(sorted((r.antecedent, r.consequent)))
        by_pair.setdefault(key, []).append(r)
    for key, pair in by_pair.items():
        assert len(pair) == 2, key  # both directions present
        assert pair[0].support == pair[1].support
        assert pair[0].lift == pair[1].lift
