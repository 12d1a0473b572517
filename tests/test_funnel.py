"""Window-funnel semantics on a hand-built event log: the
earliest-chain convention (t1 = first view, t2 = first click after
t1, t3 = first purchase after t2; each within the window of t1) and
its edge cases — out-of-order steps don't count, late completions cap
the level, step-1-less users are level 0."""

import datetime as dt
import os

import pyspark.sql.functions as F

from dataframe_retail_e_inventarios_spark.plans.queries_streaming import (
    _FUNNEL_WINDOW_MIN,
    q_window_funnel_levels,
)


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [
            (i, ts, uid, et, 1.0, "{}")
            for i, (uid, et, ts) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "events.parquet")
    )
    return str(tmp_path)


def test_window_funnel_levels_hand_case(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    w = dt.timedelta(minutes=_FUNNEL_WINDOW_MIN)
    rows = [
        # u1: view only -> level 1
        (1, "view", t0),
        # u2: view then click inside window -> level 2
        (2, "view", t0),
        (2, "click", t0 + m),
        # u3: full ordered chain inside window -> level 3
        (3, "view", t0),
        (3, "click", t0 + m),
        (3, "purchase", t0 + 2 * m),
        # u4: purchase BEFORE any view (order matters) -> level 1
        (4, "purchase", t0),
        (4, "view", t0 + m),
        # u5: click in window, purchase after window -> level 2
        (5, "view", t0),
        (5, "click", t0 + m),
        (5, "purchase", t0 + w + m),
        # u6: click/purchase but never a view -> level 0
        (6, "click", t0),
        (6, "purchase", t0 + m),
        # u7: click before the first view doesn't count; the one after
        # does -> level 2
        (7, "click", t0),
        (7, "view", t0 + m),
        (7, "click", t0 + 2 * m),
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    got = {
        r["level"]: r["n_users"]
        for r in q_window_funnel_levels(spark, sf_dir).collect()
    }
    assert got == {0: 1, 1: 2, 2: 3, 3: 1}


def test_window_funnel_counts_partition_users(spark, tmp_path):
    """Every distinct user lands in exactly one level bucket."""
    t0 = dt.datetime(2024, 1, 1)
    rows = [(u, et, t0 + dt.timedelta(minutes=u)) for u in range(20)
            for et in (["view"] if u % 2 else ["click"])]
    sf_dir = _write_events(spark, tmp_path, rows)
    out = q_window_funnel_levels(spark, sf_dir)
    assert out.agg(F.sum("n_users")).collect()[0][0] == 20


def test_survival_km_properties(spark):
    """KM invariants on the fixture: risk-set recurrence
    n_{i+1} = n_i - d_i - c_i, and — because this design censors only
    at the horizon — S(t) equals the ECDF complement (n - cum_d)/n
    exactly (the two estimators coincide iff no interior censoring)."""
    from dataframe_retail_e_inventarios_spark.plans.queries_stats import (
        q_survival_km_signup_purchase,
    )

    rows = q_survival_km_signup_purchase(spark, "/root/testdata/sf0.01").collect()
    n0 = rows[0]["n_risk"]
    cum_d = 0
    for i, r in enumerate(rows):
        if i + 1 < len(rows):
            assert rows[i + 1]["n_risk"] == r["n_risk"] - r["n_events"] - r["n_censored"]
        cum_d += r["n_events"]
        assert abs(r["survival"] - round((n0 - cum_d) / n0, 6)) <= 1e-6
    assert rows[-1]["n_censored"] >= 0
