"""Data-quality profiling [SURVEY §2.11 beyond-reference]: the
pre-flight check every large-scale ingest runs before trusting a new
drop — per-column null rates / distinct counts / ranges, and value
histograms for drift detection.

Column profile shape: ONE aggregate pass computes every column's
stats as flat aggregate expressions (count/count-distinct/min/max per
column in a single groupBy-less agg), then a stack() unpivots the
1-row result into (column, stats) rows. The corpus is scanned once no
matter how many columns are profiled; the unpivot is driver-free and
operates on a single row. count(DISTINCT a), count(DISTINCT b) in one
aggregate expands (Catalyst rewrites multi-distinct via expand), so at
very wide schemas you'd split the profile into column groups — noted,
not needed at this schema width.

Histogram shape: fixed-width bins via floor((x - lo) / w) — a pure
projection + one aggregate, no sort, no percentile. Bounds are passed
in (from a prior profile pass or domain knowledge), keeping the
histogram a single-scan operator.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def column_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_s, max_s) per column.

    min/max surface as strings so heterogeneous column types fit one
    output schema (the standard profiling-tool convention).
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (col_name, n_nulls, n_distinct, min_s, max_s)"
        ),
        F.col("_n").alias("n_rows"),
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_s", "max_s")


def column_profile_split(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Exact profile as one LIGHT scan per column (r10 verdict #3).

    Same output contract as ``column_profile``, different physical
    shape: each column gets its own aggregate over a single-column
    projection, and the per-column 1-row results union together.
    With exactly ONE distinct aggregate per scan Catalyst plans the
    two-phase partial-distinct rewrite instead of the multi-distinct
    Expand (which multiplies the scanned row volume by the column
    count), and each scan's parquet read prunes to that one column.
    k columns => k cheap pruned scans instead of one k-times-exploded
    wide scan; on the sf0.1 fact table this is ~5x faster and it's the
    shape that survives wide schemas at 100 TB. Use ``column_profile``
    when the source is NOT a columnar store (one pass beats k re-reads
    if every read must materialize full rows)."""
    parts = []
    for c in cols:
        parts.append(
            df.select(F.col(c))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col(c).isNull().cast("long")).alias("n_nulls"),
                F.count_distinct(F.col(c)).alias("n_distinct"),
                F.min(F.col(c)).cast("string").alias("min_s"),
                F.max(F.col(c)).cast("string").alias("max_s"),
            )
            .select(
                F.lit(c).alias("col_name"),
                "n_rows",
                "n_nulls",
                "n_distinct",
                "min_s",
                "max_s",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def column_profile_approx(
    df: DataFrame, cols: Sequence[str], rsd: float = 0.05
) -> DataFrame:
    """The 100 TB default profile: identical shape to
    ``column_profile`` but distinct counts come from
    ``approx_count_distinct`` (HyperLogLog++, relative sd ``rsd``).

    Exact multi-column count-distinct rewrites through Catalyst's
    Expand — the scanned row volume is multiplied by the number of
    distinct aggregates (r7 verdict: 8.8 s on a 5-column sf0.1
    profile, and linear in both corpus and column count). HLL
    sketches are single-pass, mergeable, fixed-size per column, so
    this variant profiles any width at one true scan with map-side
    partials. Use ``column_profile`` (exact, oracle-gated) when the
    profile feeds a decision that needs exact cardinalities; the
    estimates here are within ``rsd`` with high probability
    (property-tested against the exact twin)."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.approx_count_distinct(F.col(c), rsd).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (col_name, n_nulls, n_distinct_approx, min_s, max_s)"
        ),
        F.col("_n").alias("n_rows"),
    ).select(
        "col_name", "n_rows", "n_nulls", "n_distinct_approx", "min_s", "max_s"
    )


def fixed_width_histogram(
    df: DataFrame, value_col: str, lo: float, hi: float, n_bins: int
) -> DataFrame:
    """(bin, lo_edge, count) histogram of ``value_col`` over [lo, hi).

    Out-of-range values clamp into the edge bins (standard drift-watch
    behavior: a runaway tail shows up as a swollen edge bin, not as
    dropped rows)."""
    w = (hi - lo) / n_bins
    raw = F.floor((F.col(value_col) - lo) / w)
    bin_ = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)).cast("long")
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(bin_.alias("bin"))
        .agg(F.count("*").alias("n"))
        .select("bin", (F.lit(lo) + F.col("bin") * w).alias("lo_edge"), "n")
    )
