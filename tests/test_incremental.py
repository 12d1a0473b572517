"""Property test for incremental rollup maintenance: folding partials
batch-by-batch must be bit-identical to the one-shot aggregate, under
any split of the fact into batches."""

import random

import pyspark.sql.functions as F

from dataframe_retail_e_inventarios_spark.operators.incremental import (
    finalize_rollup,
    fold_rollup,
    rollup_partials,
)
from dataframe_retail_e_inventarios_spark.sources.readers import load_table

from conftest import SF_SMOKE

KEYS = ("l_partkey", "ship_month")


def _fact(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    month = (F.year("l_shipdate") * 100 + F.month("l_shipdate")).cast("long")
    return li.select("l_partkey", month.alias("ship_month"), "l_quantity")


def _sorted_rows(df):
    return sorted(
        (tuple(r) for r in finalize_rollup(df).collect()),
        key=lambda t: (t[0], t[1]),
    )


class TestFoldEqualsOneShot:
    def test_two_way_random_splits(self, spark):
        fact = _fact(spark).cache()
        one_shot = _sorted_rows(rollup_partials(fact, KEYS, "l_quantity"))
        rng = random.Random(7)
        for _ in range(3):
            cut = rng.randint(199201, 199812)
            base = rollup_partials(
                fact.filter(F.col("ship_month") < cut), KEYS, "l_quantity"
            )
            delta = rollup_partials(
                fact.filter(F.col("ship_month") >= cut), KEYS, "l_quantity"
            )
            assert _sorted_rows(fold_rollup(base, delta, KEYS)) == one_shot
        fact.unpersist()

    def test_multi_batch_chain(self, spark):
        """Three-way chained fold (monthly maintenance): fold(fold(a,b),c)."""
        fact = _fact(spark).cache()
        one_shot = _sorted_rows(rollup_partials(fact, KEYS, "l_quantity"))
        a = rollup_partials(fact.filter(F.col("ship_month") < 199500), KEYS, "l_quantity")
        b = rollup_partials(
            fact.filter((F.col("ship_month") >= 199500) & (F.col("ship_month") < 199700)),
            KEYS,
            "l_quantity",
        )
        c = rollup_partials(fact.filter(F.col("ship_month") >= 199700), KEYS, "l_quantity")
        chained = fold_rollup(fold_rollup(a, b, KEYS), c, KEYS)
        assert _sorted_rows(chained) == one_shot
        fact.unpersist()

    def test_empty_delta_is_identity(self, spark):
        fact = _fact(spark)
        base = rollup_partials(fact, KEYS, "l_quantity")
        empty = rollup_partials(fact.filter(F.lit(False)), KEYS, "l_quantity")
        assert _sorted_rows(fold_rollup(base, empty, KEYS)) == _sorted_rows(base)
