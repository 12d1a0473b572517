"""Self-check harness mirroring the driver's correctness gate.

Runs a registered Spark query and its DuckDB oracle on the same parquet
tables, sorts columns by name and rows by value, and compares. Used by
tests and tools/selfcheck.py; strict by default (bitwise equality for
every cell) so any engine-vs-oracle drift surfaces before the driver's
value-hash does.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from .sources.readers import TESTDATA_TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


@dataclass
class CompareResult:
    name: str
    ok: bool
    rows_spark: int
    rows_oracle: int
    issues: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK " if self.ok else "FAIL"
        msg = f"[{status}] {self.name}: spark={self.rows_spark} oracle={self.rows_oracle}"
        for i in self.issues[:8]:
            msg += f"\n    - {i}"
        return msg


def compare_query(
    spark: SparkSession,
    name: str,
    fn,
    sql: str,
    sf_dir: str,
    float_tol: float = 0.0,
) -> CompareResult:
    sdf = _normalize(fn(spark, sf_dir).toPandas())
    con = duckdb_con(sf_dir)
    try:
        odf = _normalize(con.execute(sql).fetchdf())
    finally:
        con.close()

    issues: list[str] = []
    if list(sdf.columns) != list(odf.columns):
        issues.append(f"columns differ: spark={list(sdf.columns)} oracle={list(odf.columns)}")
    if len(sdf) != len(odf):
        issues.append("row count differs")
    if not issues:
        for c in sdf.columns:
            a, b = sdf[c], odf[c]
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                af = a.astype(float).to_numpy()
                bf = b.astype(float).to_numpy()
                bad = 0
                maxd = 0.0
                for x, y in zip(af, bf):
                    if math.isnan(x) and math.isnan(y):
                        continue
                    d = abs(x - y)
                    if not (d <= float_tol):
                        bad += 1
                        maxd = max(maxd, d if not math.isnan(d) else float("inf"))
                if bad:
                    issues.append(f"col {c}: {bad} cells differ (max abs diff {maxd:.3e})")
            else:
                neq = ~((a == b) | (a.isna() & b.isna()))
                if neq.any():
                    i = int(neq.idxmax())
                    issues.append(
                        f"col {c}: {int(neq.sum())} cells differ "
                        f"(first at row {i}: {a[i]!r} vs {b[i]!r})"
                    )
    return CompareResult(name, not issues, len(sdf), len(odf), issues)
