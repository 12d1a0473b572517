"""Physical file layout [SURVEY §4.2]: the two write-side knobs that
decide whether a 100 TB table is scannable — bounded file sizes (the
small-files problem kills list/open overhead and NameNode-style
metadata) and range-clustered files (parquet footer min/max stats only
skip IO when each file covers a narrow, mostly disjoint key range).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_parquet_compacted(
    df: DataFrame, path: str, max_records_per_file: int
) -> None:
    """Parquet sink with bounded file sizes via maxRecordsPerFile —
    the writer splits output files at the record cap regardless of
    task count, so a skewed task can't emit one giant file and a
    thousand tiny tasks can't emit a thousand splinters (pair with
    AQE coalescing for the lower bound)."""
    (
        df.write.mode("overwrite")
        .option("maxRecordsPerFile", str(max_records_per_file))
        .parquet(path)
    )


def write_range_clustered(
    df: DataFrame, path: str, cluster_cols: Sequence[str], n_files: int
) -> None:
    """Range-partition on ``cluster_cols`` then sort within partitions
    before writing: each output file covers a narrow, near-disjoint
    range of the cluster key, so parquet footer min/max stats let a
    point/range scan skip almost every file (the single-dimension
    version of Z-ordering; for multi-column skipping interleave a
    computed Z-value and cluster on that)."""
    (
        df.repartitionByRange(n_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(path)
    )
