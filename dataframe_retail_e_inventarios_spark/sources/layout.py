"""Physical file layout [SURVEY §4.2]: the two write-side knobs that
decide whether a 100 TB table is scannable — bounded file sizes (the
small-files problem kills list/open overhead and NameNode-style
metadata) and range-clustered files (parquet footer min/max stats only
skip IO when each file covers a narrow, mostly disjoint key range).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
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


def zorder_value(col_a, col_b, lo_a, hi_a, lo_b, hi_b, bits: int = 16):
    """Interleaved Morton/Z value of two numeric columns, each min-max
    scaled to ``bits`` bits. Flat bitwise expression (2·bits terms) —
    whole-stage codegen, no UDF. Bounds are passed in: at scale they
    come from table stats / a profile pass, not a data scan per write."""
    max_code = (1 << bits) - 1

    def code(c, lo, hi):
        span = float(hi - lo) or 1.0
        scaled = F.floor((c.cast("double") - float(lo)) / span * max_code)
        return F.least(F.greatest(scaled, F.lit(0)), F.lit(max_code)).cast("long")

    a, b = code(col_a, lo_a, hi_a), code(col_b, lo_b, hi_b)
    z = F.lit(0).cast("long")
    for i in range(bits):
        # bitwiseOR, not `|` (Column.__or__ is boolean OR)
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i) % 2, 2 * i + 1)
        ).bitwiseOR(F.shiftleft(F.shiftright(b, i) % 2, 2 * i))
    return z


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bounds: tuple[float, float, float, float],
    n_files: int,
    bits: int = 16,
) -> None:
    """Two-dimensional clustering: range-partition + sort on the
    interleaved Z value, so every output file covers a small
    RECTANGLE-ish region of (col_a, col_b) space — footer min/max
    stats then skip files for predicates on EITHER column, which
    single-column range clustering can only do for its one column.
    ``bounds`` = (lo_a, hi_a, lo_b, hi_b)."""
    lo_a, hi_a, lo_b, hi_b = bounds
    z = zorder_value(F.col(col_a), F.col(col_b), lo_a, hi_a, lo_b, hi_b, bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
