"""Oracle output-type lint: no DuckDB oracle may expose HUGEINT or
DECIMAL result columns.

Root cause of every r3 driver hash mismatch that wasn't signed-zero:
DuckDB's sum(BIGINT) (and window sums / list_sum over BIGINT) returns
HUGEINT, and a bare decimal literal (``0.0``, ``/ 10000.0``) makes
DECIMAL expressions. Both pandas-fetch as float64 ("5.0") while the
Spark side returns int64 ("5") — equal values, different driver-hash
formatting. This test runs every registered oracle at sf0.001 and
fails on any decimal128 column in the Arrow schema, so a new query
can't reintroduce the exposure. DuckDB-only: no SparkSession needed.
"""

import os

import duckdb
import pytest

from dataframe_retail_e_inventarios_spark.registry import oracle_sql
from dataframe_retail_e_inventarios_spark.sources.readers import TESTDATA_TABLES
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(SF_SMOKE, f"{t}.parquet")
        if os.path.exists(path):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    yield c
    c.close()


def test_no_oracle_exposes_hugeint_or_decimal_columns(con):
    offenders = {}
    for name, sql in oracle_sql().items():
        schema = con.execute(sql).arrow().schema
        bad = [f"{f.name}:{f.type}" for f in schema if "decimal" in str(f.type)]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracle columns that pandas-fetch as float64 but hash-compare "
        f"against Spark integer/double output: {offenders} — wrap the "
        "sum in CAST(... AS BIGINT) or the literal in CAST(... AS DOUBLE)"
    )
