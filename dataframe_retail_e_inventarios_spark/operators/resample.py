"""Time-bucketed (resample) aggregation with dense gap-fill
[SURVEY §2.4 A2-A3, §2.8 T7].

pandas ``resample('W-SUN').sum()`` (PRACTICA3.py:94) has two properties
Spark's ``groupBy(window)`` lacks out of the box:

1. **Label edge**: weeks end on Sunday and are right-labeled — a
   timestamp belongs to the next Sunday on-or-after its calendar date
   (a Sunday belongs to itself, including intraday times; verified
   empirically against pandas 2.2, see tests/test_resample.py).
2. **Density**: empty buckets between the series' min and max label are
   emitted (value 0 after ``.sum().fillna(0)``).

Label: ``date_add(to_date(ts), (8 - dayofweek(ts)) % 7)`` — Spark's
``dayofweek`` is 1=Sunday..7=Saturday, so the offset to the next Sunday
is ``(8 - dow) % 7`` (0 when already Sunday).

Density: a per-series date spine ``sequence(min_wk, max_wk, 7 days)``
exploded and left-joined. At 100 TB the spine is built from the
*aggregated* weekly table (series x weeks, ~3 orders of magnitude
smaller than the fact), never from raw rows.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


_MICROS_PER_DAY = 86_400_000_000


def wall_date(ts: Column | str, is_instant: bool = False) -> Column:
    """Calendar date of a timestamp, independent of the session timezone.

    Spark 4 reads naive parquet timestamps as TIMESTAMP_NTZ by default,
    where ``to_date`` is already timezone-free. But if the column is an
    instant (TIMESTAMP_LTZ — e.g. NTZ inference disabled, or a true
    instant column), ``to_date`` re-renders in the session timezone and
    silently shifts dates when the session isn't UTC (DuckDB reads the
    same stored values as naive and never shifts). For that case we
    derive the date from the raw epoch micros — pure integer arithmetic
    inside codegen, no tz lookup at 100 TB scan width.
    """
    ts = F.col(ts) if isinstance(ts, str) else ts
    if is_instant:
        days = F.floor(F.unix_micros(ts) / F.lit(_MICROS_PER_DAY))
        return F.date_from_unix_date(days.cast("int"))
    return F.to_date(ts)


def _is_instant(df: DataFrame, ts_col: str) -> bool:
    from pyspark.sql.types import TimestampType

    return isinstance(df.schema[ts_col].dataType, TimestampType)


def week_ending_sunday(ts: Column | str, is_instant: bool = False) -> Column:
    """pandas W-SUN right-closed/right-labeled bucket label, as a DATE."""
    d = wall_date(ts, is_instant)
    return F.date_add(d, (F.lit(8) - F.dayofweek(d)) % 7)


# DuckDB-equivalent expression for the same label (isodow: 1=Mon..7=Sun).
WEEK_ENDING_SUNDAY_SQL = (
    "CAST({ts} AS DATE) + CAST((7 - isodow(CAST({ts} AS DATE))) % 7 AS INTEGER)"
)


def weekly_resample_sum(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    week_col: str = "week",
    out_col: str | None = None,
) -> DataFrame:
    """Sparse weekly sum: groupBy(keys, W-SUN label) [A2 without density]."""
    out_col = out_col or value_col
    return (
        df.withColumn(week_col, week_ending_sunday(ts_col, _is_instant(df, ts_col)))
        .groupBy(*keys, week_col)
        .agg(F.sum(value_col).alias(out_col))
    )


def densify_weeks(
    weekly: DataFrame,
    keys: Sequence[str],
    week_col: str = "week",
    value_cols: Sequence[str] = ("units_sold",),
    fill: float = 0.0,
) -> DataFrame:
    """Gap-fill a weekly table to pandas-resample density [A2 spine].

    Bounds come from the already-aggregated weekly table (cheap); the
    spine explode produces series x span rows; the left join runs on
    (keys, week). With AQE on, the join is re-planned at runtime if the
    spine side turns out small enough to broadcast.
    """
    keys = list(keys)
    bounds = weekly.groupBy(*keys).agg(
        F.min(week_col).alias("_min_wk"), F.max(week_col).alias("_max_wk")
    )
    # explode_outer: a plain explode makes InferFiltersFromGenerate add
    # a `size(sequence(...)) > 0` pre-filter that materializes every
    # spine array twice per row. Bounds rows always yield min<=max so
    # the outer variant is semantics-identical here.
    spine = bounds.select(
        *keys,
        F.explode_outer(
            F.sequence("_min_wk", "_max_wk", F.expr("interval 7 days"))
        ).alias(week_col),
    )
    dense = spine.join(weekly, on=[*keys, week_col], how="left")
    return dense.na.fill({c: fill for c in value_cols})


def weekly_dense_resample(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    week_col: str = "week",
) -> DataFrame:
    """pandas ``groupby(keys).resample('W-SUN').sum().fillna(0)``
    [A2: PRACTICA3.py:90-94], distributed.

    Shuffle shape: instead of the textbook bounds-aggregate + spine
    explode + left join (three extra exchanges), each series collects
    its weekly sums into a map in ONE groupBy(keys) pass, then explodes
    the full week sequence with a map lookup. The exploded output
    preserves hashpartitioning(keys), so every downstream
    Window.partitionBy(keys) / groupBy(keys) runs WITHOUT another
    shuffle — the flagship goes from ~7 exchanges to 3. Per-series
    state is bounded by the series' span in weeks (thousands at most),
    safe for executor memory at any corpus size.
    """
    keys = list(keys)
    weekly = weekly_resample_sum(df, keys, ts_col, value_col, week_col)
    per_series = weekly.groupBy(*keys).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(week_col).alias("w"), F.col(value_col).alias("v")))
        ).alias("_es")
    )
    es = F.col("_es")
    week7 = F.expr("interval 7 days")

    def entry_with_gap(e, i):
        # this entry, followed by zero rows for the gap up to (not
        # including) the next entry's week — O(span) total, no lookups.
        nxt = F.try_element_at(es, i + 2)  # 1-based; null past the end (ANSI-safe)
        gap = F.when(
            nxt.isNotNull() & (F.date_add(e["w"], 7) <= F.date_sub(nxt["w"], 7)),
            F.transform(
                F.sequence(F.date_add(e["w"], 7), F.date_sub(nxt["w"], 7), week7),
                lambda wk: F.struct(wk.alias("w"), F.lit(0.0).alias("v")),
            ),
        ).otherwise(F.array().cast("array<struct<w:date,v:double>>"))
        return F.concat(F.array(F.struct(e["w"].alias("w"), e["v"].alias("v"))), gap)

    dense_arr = per_series.select(
        *keys, F.flatten(F.transform(es, entry_with_gap)).alias("_dense")
    )
    exploded = dense_arr.select(*keys, F.explode_outer("_dense").alias("_e"))
    return exploded.select(
        *keys,
        F.col("_e.w").alias(week_col),
        F.col("_e.v").alias(value_col),
    )


def daily_resample_sum(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    day_col: str = "ds",
) -> DataFrame:
    """pandas ``resample('D', on=ts).agg(sum)`` [A3: limpieza_de_datos.py:23]
    (sparse; pair with ``densify_days`` for pandas density)."""
    return (
        df.withColumn(day_col, wall_date(ts_col, _is_instant(df, ts_col)))
        .groupBy(*keys, day_col)
        .agg(F.sum(value_col).alias(value_col))
    )


def densify_days(
    daily: DataFrame,
    keys: Sequence[str],
    day_col: str = "ds",
    value_cols: Sequence[str] = ("y",),
    fill: float = 0.0,
) -> DataFrame:
    keys = list(keys)
    bounds = daily.groupBy(*keys).agg(
        F.min(day_col).alias("_min_d"), F.max(day_col).alias("_max_d")
    )
    spine = bounds.select(
        *keys,
        F.explode_outer(F.sequence("_min_d", "_max_d", F.expr("interval 1 day"))).alias(day_col),
    )
    dense = spine.join(daily, on=[*keys, day_col], how="left")
    return dense.na.fill({c: fill for c in value_cols})
