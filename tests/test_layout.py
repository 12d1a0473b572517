"""Physical layout writers (sources/layout.py): file-count bounds and
footer-stat disjointness verified against the actual parquet metadata
(pyarrow), not just the plan."""

import glob

import pyarrow.parquet as pq
import pyspark.sql.functions as F

from dataframe_retail_e_inventarios_spark.sources.layout import (
    write_parquet_compacted,
    write_range_clustered,
)
from dataframe_retail_e_inventarios_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


def _files(path):
    return sorted(glob.glob(f"{path}/part-*.parquet"))


def test_compacted_write_bounds_file_sizes(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events").coalesce(1)  # one fat task
    out = str(tmp_path / "compacted")
    write_parquet_compacted(ev, out, max_records_per_file=200)
    files = _files(out)
    counts = [pq.ParquetFile(f).metadata.num_rows for f in files]
    assert len(files) >= 3  # the fat task was split
    assert max(counts) <= 200
    assert sum(counts) == ev.count()


def test_range_clustered_files_have_disjoint_stats(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events")
    out = str(tmp_path / "clustered")
    write_range_clustered(ev, out, ("user_id",), n_files=8)
    spans = []
    total = 0
    for f in _files(out):
        md = pq.ParquetFile(f).metadata
        total += md.num_rows
        idx = md.schema.names.index("user_id")
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        spans.append((lo, hi))
    assert total == ev.count()
    spans.sort()
    # Ranges must be (near-)disjoint: every file's min is >= the
    # previous file's max (boundary value may be shared).
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert lo2 >= hi1
    # Data skipping payoff: a point lookup's key range intersects at
    # most 2 files (boundary duplication), not all of them.
    key = spans[len(spans) // 2][0]
    touched = sum(1 for lo, hi in spans if lo <= key <= hi)
    assert touched <= 2 < len(spans)


def _file_spans(path, col):
    spans = []
    for f in _files(path):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        spans.append((lo, hi))
    return spans


def test_zorder_narrows_both_dimensions(spark, tmp_path):
    """Z-order clustering: per-file footer ranges must be materially
    narrower than the global range on BOTH columns (single-column
    range clustering narrows only its own column — that contrast is
    the point of interleaving)."""
    from dataframe_retail_e_inventarios_spark.sources.layout import (
        write_zorder_clustered,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    lo_u, hi_u, lo_v, hi_v = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()
    out = str(tmp_path / "zorder")
    write_zorder_clustered(
        ev, out, "user_id", "value", (lo_u, hi_u, lo_v, hi_v), n_files=16
    )

    back = spark.read.parquet(out)
    assert back.count() == ev.count()

    for col, glo, ghi in (("user_id", lo_u, hi_u), ("value", lo_v, hi_v)):
        spans = _file_spans(out, col)
        assert len(spans) >= 8
        gspan = float(ghi - glo) or 1.0
        avg_frac = sum((hi - lo) / gspan for lo, hi in spans) / len(spans)
        assert avg_frac < 0.7, (col, avg_frac)


def test_range_clustered_reads_back_complete(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events")
    out = str(tmp_path / "clustered2")
    write_range_clustered(ev, out, ("user_id",), n_files=4)
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    assert (
        back.agg(F.sum("event_id")).first()[0] == ev.agg(F.sum("event_id")).first()[0]
    )
