"""Data-quality constraint audit: planted-violation unit tests plus
plan shape (broadcast anti-join for dimension FKs, single-scan
predicate audit)."""

import pyspark.sql.functions as F

from tests.conftest import SF_SMOKE

from dataframe_retail_e_inventarios_spark.operators.dq import (
    foreign_key_audit,
    predicate_audit,
    union_audits,
    unique_audit,
)


def _rows(df):
    return {r["constraint"]: r.asDict() for r in df.collect()}


def test_predicate_audit_counts_planted_violations_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (3, None), (4, 0.0)], "id long, qty double"
    )
    out = _rows(
        predicate_audit(df, [("qty_positive", F.col("qty") <= 0)])
    )
    r = out["qty_positive"]
    # -1.0 and 0.0 violate; NULL cannot be evaluated -> counts as a
    # violation (a rule that can't pass did not pass)
    assert r["n_checked"] == 4
    assert r["n_violations"] == 3
    assert r["ok"] is False


def test_predicate_audit_single_scan_for_many_rules(spark):
    df = spark.createDataFrame([(1, 5.0)], "id long, qty double")
    q = predicate_audit(
        df,
        [
            ("a", F.col("qty") < 0),
            ("b", F.col("qty") > 100),
            ("c", F.col("id").isNull()),
        ],
    )
    plan = q._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    # all three rules fold into ONE aggregate over one scan
    assert plan.count("Scan ExistingRDD") <= 1
    assert {r["constraint"] for r in q.collect()} == {"a", "b", "c"}


def test_unique_audit_detects_duplicate_composite_keys(spark):
    df = spark.createDataFrame(
        [(1, 1), (1, 2), (1, 1), (2, 1), (1, 1)], "k1 long, k2 long"
    )
    r = _rows(unique_audit(df, "pk", ["k1", "k2"]))["pk"]
    assert r["n_checked"] == 5
    assert r["n_violations"] == 2  # (1,1) appears 3x -> 2 extras
    assert r["ok"] is False


def test_foreign_key_audit_counts_orphans_and_null_keys(spark):
    child = spark.createDataFrame(
        [(10,), (10,), (20,), (99,), (None,)], "fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    r = _rows(foreign_key_audit(child, "fk_ok", "fk", parent, "pk"))["fk_ok"]
    # 99 is an orphan; NULL is an unresolvable reference -> orphan
    assert r["n_checked"] == 5
    assert r["n_violations"] == 2
    assert r["ok"] is False


def test_foreign_key_audit_broadcasts_dimension_parent(spark):
    child = spark.createDataFrame([(10,)], "fk long")
    parent = spark.createDataFrame([(10,)], "pk long")
    q = foreign_key_audit(child, "fk", "fk", parent, "pk")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_union_audit_all_green_on_clean_data(spark):
    df = spark.createDataFrame([(1, 2.0), (2, 3.0)], "id long, v double")
    report = union_audits(
        predicate_audit(df, [("v_pos", F.col("v") <= 0)]),
        unique_audit(df, "id_unique", ["id"]),
    )
    assert all(r["ok"] for r in report.collect())


def test_observation_metrics_ride_the_main_query_for_free(spark):
    """df.observe attaches DQ counters to the MAIN query's execution —
    audit numbers arrive with the action, zero extra scans. The
    counters must match a standalone aggregate over the same frame."""
    from pyspark.sql import Observation

    from dataframe_retail_e_inventarios_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE

    li = load_table(spark, SF_SMOKE, "lineitem")
    obs = Observation("dq")
    watched = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("l_quantity") <= 0).cast("long")).alias("bad_qty"),
        F.sum(F.col("l_extendedprice").isNull().cast("long")).alias("null_price"),
    )
    # the "main query": a real aggregation the pipeline would run anyway
    result = watched.groupBy("l_returnflag").count().collect()
    assert len(result) > 0

    expected = li.agg(
        F.count(F.lit(1)),
        F.sum((F.col("l_quantity") <= 0).cast("long")),
        F.sum(F.col("l_extendedprice").isNull().cast("long")),
    ).collect()[0]
    got = obs.get
    assert (got["n_rows"], got["bad_qty"], got["null_price"]) == tuple(expected)


def test_table_audit_fuses_predicates_and_uniqueness_into_one_scan(spark):
    from dataframe_retail_e_inventarios_spark.operators.dq import table_audit

    df = spark.createDataFrame(
        [(1, 1, 5.0), (1, 1, -2.0), (2, 1, 3.0)], "k1 long, k2 long, v double"
    )
    q = table_audit(
        df,
        checks=[("v_pos", F.col("v") <= 0)],
        unique=[("pk", ["k1", "k2"])],
    )
    rows = {r["constraint"]: r.asDict() for r in q.collect()}
    assert rows["v_pos"]["n_violations"] == 1
    assert rows["pk"]["n_violations"] == 1  # (1,1) twice
    plan = q._jdf.queryExecution().executedPlan().toString()
    # AQE prints final + initial plans; count scans in the FINAL only
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan ExistingRDD") <= 1  # fused: one scan total


def test_join_cardinality_probe_estimate_is_exact(spark):
    """For an equi-join the histogram-product estimate equals the
    physical join's row count — the property that makes the probe a
    trustworthy pre-flight check."""
    from dataframe_retail_e_inventarios_spark.plans.queries_dq import (
        q_join_cardinality_probe,
    )
    from dataframe_retail_e_inventarios_spark.sources.readers import load_table

    est = q_join_cardinality_probe(spark, SF_SMOKE).collect()[0]["est_rows"]
    orders = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    actual = orders.join(li, orders.o_orderkey == li.l_orderkey).count()
    assert est == actual


def test_k_anonymity_audit_consistency(spark):
    """Class counts and row shares reconcile: rows_below_k <= n_rows,
    share matches the ratio, min_k >= 1."""
    from dataframe_retail_e_inventarios_spark.plans.queries_dq import (
        q_k_anonymity_audit,
    )

    r = q_k_anonymity_audit(spark, SF_SMOKE).collect()[0]
    assert r["min_k"] >= 1
    assert 0 <= r["rows_below_k"] <= r["n_rows"]
    assert abs(r["share_below_k"] - r["rows_below_k"] / r["n_rows"]) < 1e-6
    assert r["classes_below_k"] <= r["n_classes"]


def test_content_fingerprint_detects_single_cell_change(spark):
    """The month fingerprint must move when ONE cell in that month
    changes, stay identical under re-partitioning, and match between a
    frame and its row-shuffled copy."""
    import pyspark.sql.functions as F

    from dataframe_retail_e_inventarios_spark.plans.queries_dq import (
        q_content_fingerprint_by_month,
    )
    from conftest import SF_SMOKE

    base = {
        r.month: (r.n_rows, r.content_fp)
        for r in q_content_fingerprint_by_month(spark, SF_SMOKE).collect()
    }
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        alt = {
            r.month: (r.n_rows, r.content_fp)
            for r in q_content_fingerprint_by_month(spark, SF_SMOKE).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == alt
    # single-cell mutation: bump one row's quantity via a patched view
    from dataframe_retail_e_inventarios_spark.sources.readers import load_table

    li = load_table(spark, SF_SMOKE, "lineitem")
    first = li.orderBy("l_orderkey", "l_linenumber").limit(1).collect()[0]
    patched = li.withColumn(
        "l_quantity",
        F.when(
            (F.col("l_orderkey") == first.l_orderkey)
            & (F.col("l_linenumber") == first.l_linenumber),
            F.col("l_quantity") + 1,
        ).otherwise(F.col("l_quantity")),
    )
    import dataframe_retail_e_inventarios_spark.plans.queries_dq as qdq
    import dataframe_retail_e_inventarios_spark.sources.readers as readers

    orig = readers.load_table
    try:
        readers_patch = lambda sp, sf, t: patched if t == "lineitem" else orig(sp, sf, t)  # noqa: E731
        qdq.load_table = readers_patch
        mutated = {
            r.month: (r.n_rows, r.content_fp)
            for r in qdq.q_content_fingerprint_by_month(spark, SF_SMOKE).collect()
        }
    finally:
        qdq.load_table = orig
    month = first.l_shipdate.strftime("%Y-%m")
    assert mutated[month] != base[month]
    assert all(mutated[m] == base[m] for m in base if m != month)
