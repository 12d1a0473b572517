"""Unit tests for the data-cleaning operators: repetition metrics,
PII redaction, train/eval decontamination, approximate distinct."""

import pyspark.sql.functions as F

from dataframe_retail_e_inventarios_spark.operators.dedup import contamination_pairs
from dataframe_retail_e_inventarios_spark.operators.pii import redact_pii
from dataframe_retail_e_inventarios_spark.operators.repetition import repetition_stats
from dataframe_retail_e_inventarios_spark.sources.readers import load_table

from conftest import SF_SMOKE


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestRepetitionStats:
    def test_fully_repeated(self, spark):
        out = repetition_stats(_docs(spark, [(1, "a a a a a")])).collect()[0]
        assert out.n_tokens == 5
        assert out.dup_token_frac == 0.8  # 1 - 1/5
        assert out.top_bigram_frac == 1.0  # "a a" covers all 4 bigrams
        assert out.adj_dup_frac == 1.0
        assert out.flag_repetitive

    def test_all_distinct(self, spark):
        out = repetition_stats(_docs(spark, [(1, "a b c d e f")])).collect()[0]
        assert out.n_tokens == 6
        assert out.dup_token_frac == 0.0
        assert out.top_bigram_frac == 0.2  # every bigram unique, 1/5
        assert out.adj_dup_frac == 0.0
        assert not out.flag_repetitive

    def test_dominant_bigram(self, spark):
        # "x y" appears 3 times in 6 bigrams; no adjacent dups.
        out = repetition_stats(_docs(spark, [(1, "x y x y x y c")])).collect()[0]
        assert out.n_tokens == 7
        assert out.top_bigram_frac == 0.5
        assert out.adj_dup_frac == 0.0
        assert out.flag_repetitive

    def test_short_docs_survive(self, spark):
        rows = repetition_stats(_docs(spark, [(1, "solo"), (2, "a b")])).collect()
        by_id = {r.doc_id: r for r in rows}
        assert set(by_id) == {1, 2}
        assert by_id[1].n_tokens == 1
        assert by_id[1].top_bigram_frac == 0.0
        assert by_id[1].adj_dup_frac == 0.0
        assert by_id[2].n_tokens == 2
        assert by_id[2].top_bigram_frac == 1.0


class TestRedactPii:
    def test_redacts_and_counts(self, spark):
        out = redact_pii(
            _docs(
                spark,
                [(1, "mail bob.smith+x@corp.example.org or 555-0199 at 10.1.2.3 ok")],
            )
        ).collect()[0]
        assert (out.n_email, out.n_phone, out.n_ip) == (1, 1, 1)
        assert out.redacted == "mail <EMAIL> or <PHONE> at <IP> ok"
        assert not out.pii_free

    def test_clean_text(self, spark):
        out = redact_pii(_docs(spark, [(1, "nothing sensitive here")])).collect()[0]
        assert out.pii_free
        assert out.redacted == "nothing sensitive here"

    def test_email_consumes_its_domain_dots(self, spark):
        # the dotted domain must not double-count as an IP
        out = redact_pii(_docs(spark, [(1, "x a@10.1.2.3 y")])).collect()[0]
        assert out.n_email == 0  # TLD must be alphabetic
        assert out.n_ip == 1


class TestContaminationPairs:
    def test_planted_overlap(self, spark):
        train = _docs(
            spark,
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "completely unrelated words in this one here now"),
            ],
        )
        ev = _docs(spark, [(100, "quick brown fox jumps high")])
        out = contamination_pairs(train, ev, min_shared=2).collect()
        assert len(out) == 1
        r = out[0]
        # shared 3-grams: "quick brown fox", "brown fox jumps"
        assert (r.train_id, r.eval_id, r.n_shared) == (1, 100, 2)

    def test_min_shared_gate(self, spark):
        train = _docs(spark, [(1, "a b c x y z")])
        ev = _docs(spark, [(100, "a b c q r s")])  # exactly one shared 3-gram
        assert contamination_pairs(train, ev, min_shared=2).count() == 0
        assert contamination_pairs(train, ev, min_shared=1).count() == 1

    def test_broadcast_eval_side(self, spark):
        train = _docs(spark, [(1, "a b c d e")])
        ev = _docs(spark, [(100, "a b c")])
        plan = contamination_pairs(train, ev)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestApproxDistinct:
    def test_hll_relative_error(self, spark):
        ev = load_table(spark, SF_SMOKE, "events")
        got = (
            ev.groupBy("event_type")
            .agg(
                F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
                F.countDistinct("user_id").alias("exact"),
            )
            .collect()
        )
        assert len(got) > 0
        for r in got:
            assert abs(r.approx - r.exact) <= max(1, 0.05 * r.exact)


def test_bloom_decontamination_has_no_false_negatives(spark):
    """Every train doc the EXACT overlap query flags (>=1 shared
    shingle with the benchmark split) must also be bloom-flagged;
    bloom extras are false positives, whose rate stays under the
    analytic bound for m=65536, k=3."""
    import pyspark.sql.functions as F

    from dataframe_retail_e_inventarios_spark.operators.dedup import (
        contamination_pairs,
    )
    from dataframe_retail_e_inventarios_spark.plans.queries_datacleaning import (
        q_decontamination_bloom,
    )
    from dataframe_retail_e_inventarios_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    ev = docs.filter(F.col("doc_id") % 97 == 0)
    tr = docs.filter(F.col("doc_id") % 97 != 0)
    exact_ids = {
        r.train_id
        for r in contamination_pairs(tr, ev, min_shared=1).select("train_id").collect()
    }
    bloom = {r.doc_id: r.contaminated for r in q_decontamination_bloom(spark, SF_SMOKE).collect()}
    flagged = {d for d, c in bloom.items() if c}
    assert exact_ids <= flagged, "bloom produced a false negative"
    n_train = len(bloom)
    fp = len(flagged - exact_ids)
    # Loose ceiling: per-shingle FPP is ~(1-e^{-kn/m})^k; a doc with s
    # shingles gets ~s chances. Assert the observed rate is sane.
    assert fp / max(n_train, 1) < 0.25, f"false-positive rate {fp}/{n_train}"


def test_freq_items_sketch_has_no_false_negatives(spark):
    """Misra-Gries guarantee: every part whose true frequency exceeds
    the support threshold appears in the sketch output."""
    import pyspark.sql.functions as F

    from dataframe_retail_e_inventarios_spark.plans.queries_datacleaning import (
        FREQ_SUPPORT,
        q_frequent_parts,
    )
    from dataframe_retail_e_inventarios_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE

    li = load_table(spark, SF_SMOKE, "lineitem")
    n = li.count()
    exact_hot = {
        r.l_partkey: r.c
        for r in li.groupBy("l_partkey")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > FREQ_SUPPORT * n)
        .collect()
    }
    # registered output = sketch keys gated by the exact threshold
    # (r8 verdict #7 pattern): MG's no-false-negative guarantee means
    # this must equal the exact heavy-hitter set, counts included.
    got = {r.part_key: r.n for r in q_frequent_parts(spark, SF_SMOKE).collect()}
    assert got == exact_hot


def test_hll_sketch_rollup_merge_is_lossless_and_calibrated(spark):
    """The query's driver contract (both estimates in the lgK=12
    envelope) must hold, and at the SMOKE corpus — where every sketch
    stays in sparse exact mode — the union must additionally equal the
    one-shot estimate exactly (the raw sketches are re-derived here;
    the registered output now carries in-band booleans, r8 verdict
    #7). Cross-scale the equality is NOT guaranteed: at sf0.1 the
    one-shot promotes to dense on a different schedule than the daily
    unions."""
    import pyspark.sql.functions as F

    from dataframe_retail_e_inventarios_spark.functions.timewall import (
        wall_epoch_seconds,
    )
    from dataframe_retail_e_inventarios_spark.plans.queries_datacleaning import (
        q_hll_sketch_rollup,
    )
    from dataframe_retail_e_inventarios_spark.sources.readers import load_table

    rows = q_hll_sketch_rollup(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.merged_in_band and r.oneshot_in_band, r

    ev = load_table(spark, SF_SMOKE, "events")
    keyed = ev.select(
        "event_type",
        F.floor(wall_epoch_seconds("ts") / 86400).cast("long").alias("day"),
        (F.floor(wall_epoch_seconds("ts") / 86400) / 30).cast("long").alias("month30"),
        "user_id",
    )
    daily = keyed.groupBy("event_type", "month30", "day").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sketch")
    )
    merged = daily.groupBy("event_type", "month30").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("m")
    )
    oneshot = keyed.groupBy("event_type", "month30").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("o")
    )
    for r in merged.join(oneshot, ["event_type", "month30"]).collect():
        assert r.m == r.o, "sparse-mode daily union diverged from one-shot"


def test_approx_top_k_covers_exact_topk(spark):
    """approx_top_k's returned keys must include the exact top-k keys,
    and at the smoke corpus (cardinality far under the default sketch
    capacity of maxItemsTracked) the estimated counts are exact."""
    from dataframe_retail_e_inventarios_spark.plans.queries_datacleaning import (
        APPROX_TOPK_K,
        q_approx_top_k_parts,
    )

    li = load_table(spark, SF_SMOKE, "lineitem")
    exact = {
        r.l_partkey: r.c
        for r in li.groupBy("l_partkey").agg(F.count("*").alias("c")).collect()
    }
    # The registered output is now the strictly-above-cutoff slice
    # (r8 verdict #7): exactly the exact top-k keys with counts above
    # the k-th count, with exact estimates (sub-capacity regime).
    counts = sorted(exact.values(), reverse=True)
    cutoff = counts[APPROX_TOPK_K - 1] if len(counts) >= APPROX_TOPK_K else None
    must_have = {k for k, c in exact.items() if cutoff is not None and c > cutoff}
    got = {r.part_key: r.est_count for r in q_approx_top_k_parts(spark, SF_SMOKE).collect()}
    assert set(got) == must_have
    for k, c in got.items():
        assert exact[k] == c, f"estimated count drifted for {k}"
