"""Array-column functions [SURVEY §2.8 T1-T4].

The reference round-trips its forecast arrays through stringified CSV
cells and re-parses them by hand (generador.py:46-69). Our primary path
keeps arrays native in Parquet; these functions exist for (a) drop-in
compatibility with the reference's CSV form and (b) the array
aggregate/length derivations.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def parse_float_list(c: Column | str) -> Column:
    """Parse '"[1.0, 2.0]"' -> array<double> [T1: generador.py:48-64].

    Strip brackets/whitespace, split on commas, skip blanks, float()
    each. The reference's failure mode is ATOMIC (generador.py:62-64):
    if ANY element fails float(), the whole cell becomes [] — not just
    the bad element dropped. Mirrored with an exists-null check.
    """
    s = F.regexp_replace(_c(c).cast("string"), r"[\[\]\s]", "")
    parts = F.filter(F.split(s, ","), lambda x: x != "")
    parsed = F.transform(parts, lambda x: x.try_cast("double"))
    any_bad = F.exists(parsed, lambda x: x.isNull())
    empty = F.array().cast("array<double>")
    return F.when(~F.coalesce(any_bad, F.lit(True)), parsed).otherwise(empty)


def array_total(c: Column | str) -> Column:
    """sum(list) [T2: generador.py:59] — sequential left fold, same
    accumulation order as Python's sum()."""
    return F.aggregate(_c(c), F.lit(0.0), lambda acc, x: acc + x)


def array_len(c: Column | str) -> Column:
    """len(list) [T3: generador.py:60]; empty/null -> 0."""
    return F.coalesce(F.size(_c(c)), F.lit(0)).cast("long")


# DuckDB oracle fragments ({c} = string-encoded list column). Same
# atomic-failure semantics: any unparseable element -> [].
_PARSED = (
    "list_transform(list_filter(string_split("
    "regexp_replace({c}, '[\\[\\]\\s]', '', 'g'), ','), x -> x != ''), "
    "x -> TRY_CAST(x AS DOUBLE))"
)
PARSE_FLOAT_LIST_SQL = (
    "CASE WHEN len(list_filter(" + _PARSED + ", x -> x IS NULL)) = 0 "
    "THEN " + _PARSED + " ELSE CAST([] AS DOUBLE[]) END"
)
# Python sum(list) == left fold from 0.0; coalesce for empty lists.
ARRAY_TOTAL_SQL = "coalesce(list_aggregate({c}, 'sum'), 0.0)"
