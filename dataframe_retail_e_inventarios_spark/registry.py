"""Query registry: every implemented operator exposed as a named query.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with
a DuckDB oracle SQL string (or None for genuinely non-SQL-expressible
ops, which the driver checks rows-only). ``__spark_entry__.py`` is a
thin adapter over this module.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: str | None) -> None:
    if name in _QUERIES:
        raise ValueError(f"duplicate query name: {name}")
    _QUERIES[name] = fn
    if oracle is not None:
        _ORACLES[name] = oracle


def queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from .plans import queries_core  # noqa: F401

    for mod in (
        "queries_relational",
        "queries_stats",
        "queries_report",
        "queries_llm",
        "queries_forecast",
        "queries_streaming",
        "queries_extra",
        "queries_curation",
        "queries_datacleaning",
        "queries_sql",
        "queries_scale",
        "queries_trend",
        "queries_modern",
        "queries_layout",
    ):
        qualname = f"{__package__}.plans.{mod}"
        try:
            __import__(qualname, fromlist=["*"])
        except ModuleNotFoundError as e:
            # Only "this module isn't built yet" is ignorable; a missing
            # dependency INSIDE an existing module must fail loudly or
            # the verified query surface silently shrinks.
            if e.name != qualname:
                raise
    _LOADED = True
