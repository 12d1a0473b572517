"""Declared-reader schema evolution (r9 verdict #7): the one untested
reader-contract edge. A production drop of any testdata table may gain
columns or reorder them (parquet writers make no column-order promise);
every engine path resolves columns BY NAME, so an evolved file must
produce bit-identical query results and load_table must surface the
same types for the shared columns.

The fixture rewrites EVERY testdata table with (a) column order
reversed and (b) an appended ``_evolution_extra`` column, then replays
one representative query per table family against the evolved dir and
compares collected rows against the pristine dir — pinning by-name
semantics end-to-end (scan -> normalization -> query), not just at the
reader."""

import os

import pyspark.sql.functions as F
import pytest

from dataframe_retail_e_inventarios_spark.registry import queries
from dataframe_retail_e_inventarios_spark.sources.readers import (
    TESTDATA_TABLES,
    load_table,
)
from tests.conftest import SF_SMOKE

# One query per table family, chosen to touch every testdata table at
# least once between them:
#   lineitem/part/supplier -> topk_parts_per_supplier
#   lineitem (clean/resample/window chain) -> flagship_inventory
#   orders/customer/nation/region/lineitem -> star_join_revenue
#   events -> events_sessionization
#   documents -> text_quality_scores
#   embeddings -> ann_cosine_topk
EVOLUTION_QUERIES = (
    "flagship_inventory",
    "star_join_revenue",
    "topk_parts_per_supplier",
    "events_sessionization",
    "text_quality_scores",
    "ann_cosine_topk",
)


@pytest.fixture(scope="module")
def evolved_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("evolved_sf")
    for name in TESTDATA_TABLES:
        raw = spark.read.parquet(os.path.join(SF_SMOKE, f"{name}.parquet"))
        evolved = raw.select(*reversed(raw.columns)).withColumn(
            "_evolution_extra", F.lit("added-by-a-later-writer")
        )
        evolved.write.parquet(str(out / f"{name}.parquet"))
    return str(out)


def _rows(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


def test_load_table_resolves_by_name_on_evolved_files(spark, evolved_dir):
    for name in TESTDATA_TABLES:
        base = load_table(spark, SF_SMOKE, name)
        evo = load_table(spark, evolved_dir, name)
        # every original column survives with the SAME type (by-name,
        # order-insensitive), and the added column is visible, inert
        base_types = dict(zip(base.schema.names, base.schema.fields))
        evo_types = dict(zip(evo.schema.names, evo.schema.fields))
        assert set(base_types) <= set(evo_types), name
        for c, f in base_types.items():
            assert evo_types[c].dataType == f.dataType, (name, c)
        assert "_evolution_extra" in evo_types, name
        assert base.count() == evo.count(), name


@pytest.mark.parametrize("qname", EVOLUTION_QUERIES)
def test_queries_bit_identical_on_evolved_files(spark, evolved_dir, qname):
    q = queries()[qname]
    a = q(spark, SF_SMOKE)
    b = q(spark, evolved_dir)
    assert a.columns == b.columns, qname
    assert _rows(a) == _rows(b), qname
