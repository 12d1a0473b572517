"""Source/sink round-trips for the non-parquet formats: ORC (typed
columnar), JSONL (corpus interchange), raw text (ingest)."""

import pyspark.sql.functions as F

from dataframe_retail_e_inventarios_spark.sources.readers import (
    load_table,
    read_orc,
    read_text,
)
from dataframe_retail_e_inventarios_spark.sources.writers import write_orc
from tests.conftest import SF_SMOKE


def test_orc_roundtrip_preserves_schema_and_values(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents")
    path = str(tmp_path / "docs_orc")
    write_orc(docs, path)
    back = read_orc(spark, path)
    assert back.schema == docs.schema
    assert back.count() == docs.count()
    # value parity via an order-insensitive checksum
    chk = lambda df: df.agg(  # noqa: E731
        F.sum(F.crc32(F.concat_ws("\x00", "doc_id", "text", "lang", "source")))
    ).first()[0]
    assert chk(back) == chk(docs)


def test_orc_scan_prunes_columns_and_pushes_filters(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents")
    path = str(tmp_path / "docs_orc2")
    write_orc(docs, path)
    plan = (
        read_orc(spark, path)
        .filter(F.col("lang") == "en")
        .select("doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "lang" in plan.split("PushedFilters:")[1][:80]


def test_text_source_reads_lines(spark, tmp_path):
    p = tmp_path / "corpus.txt"
    p.write_text("first doc line\nsecond doc line\n\nfourth\n")
    df = read_text(spark, str(p))
    assert [f.name for f in df.schema.fields] == ["value"]
    lines = [r["value"] for r in df.collect()]
    assert sorted(lines) == ["", "first doc line", "fourth", "second doc line"]
