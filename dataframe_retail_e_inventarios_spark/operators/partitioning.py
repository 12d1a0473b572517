"""Physical-layout operators for the 100 TB posture [SURVEY §4.2]:
time-partitioned fact storage (partition pruning), salted joins for
skewed keys, and bucketed tables for shuffle-free co-located joins.

These don't change query semantics — they change what the scan reads
and where the shuffle happens, which is the difference between a query
that runs and one that doesn't at 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession


def write_time_partitioned(
    df: DataFrame, path: str, ts_col: str, granularity: str = "month"
) -> None:
    """Write a fact partitioned by a coarse time bucket. Date-range
    predicates then prune whole directories at plan time
    (PartitionFilters in the scan) instead of reading and filtering."""
    bucketed = df.withColumn(
        "_part", F.date_trunc(granularity, F.col(ts_col)).cast("date")
    )
    bucketed.write.mode("overwrite").partitionBy("_part").parquet(path)


def read_time_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting for skew [SURVEY §4.2].

    The big side gets a random-ish salt derived from a stable row hash
    (deterministic — no rand(), so plans stay reproducible); the small
    side is exploded across all salt values. A key carrying 30% of the
    data then lands in ``salt_buckets`` separate tasks instead of one
    straggler. AQE's skew-join handles moderate skew automatically;
    salting is for the pathological keys AQE can't split (e.g. a
    single giant build-side group in an aggregation-after-join).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets))
    big_s = big.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = big_s.join(small_s, on=[key, "_salt"], how=how)
    return out.drop("_salt")


def write_bucketed_table(
    df: DataFrame, table: str, keys: list[str], n_buckets: int = 16
) -> None:
    """Persist a table bucketed (and sorted) by join keys: two tables
    bucketed the same way join with ZERO shuffle on either side —
    the co-located join that makes repeated fact-to-fact joins viable
    at scale."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .saveAsTable(table)
    )


def compact_files(
    df: DataFrame,
    path: str,
    sort_col: str | None = None,
    max_records_per_file: int = 1_000_000,
    n_files: int | None = None,
) -> None:
    """Small-files compaction with optional range layout.

    A streaming/hourly ingest leaves thousands of tiny files per
    partition; scan cost becomes task-scheduling overhead instead of
    IO. Compaction = rewrite at a target file size. With ``sort_col``
    the rewrite uses repartitionByRange + sortWithinPartitions, so
    each output file covers a NARROW value range — parquet footer
    min/max stats then let a selective range predicate skip whole
    files/row-groups at read time (data skipping without an index;
    the same reason Delta/Iceberg Z-order exists, in its 1-D form).
    """
    w = df
    if n_files:
        w = (
            w.repartitionByRange(n_files, F.col(sort_col))
            if sort_col
            else w.repartition(n_files)
        )
    if sort_col:
        w = w.sortWithinPartitions(sort_col)
    (
        w.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(path)
    )
