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


def test_range_clustered_reads_back_complete(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events")
    out = str(tmp_path / "clustered2")
    write_range_clustered(ev, out, ("user_id",), n_files=4)
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    assert (
        back.agg(F.sum("event_id")).first()[0] == ev.agg(F.sum("event_id")).first()[0]
    )
