"""Order-insensitive exact sums for fixed-decimal values.

Summing doubles is accumulation-order-dependent; two engines (or two
partitionings of the same engine!) can land on opposite sides of a
rounding boundary. For money-like columns with a known decimal scale
the cure is exact integer arithmetic: scale each element to an
integer, sum as BIGINT (exact, associative), divide back. This also
makes results stable across shuffle-partition counts — which matters
for reproducibility at 100 TB, not just for oracle parity.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def exact_decimal_sum(expr: Column, decimals: int = 4) -> Column:
    """sum(expr) where expr is exactly representable with ``decimals``
    fractional digits; returns double."""
    scale = 10**decimals
    scaled = F.bround(expr * scale, 0).cast("long")
    return F.sum(scaled) / F.lit(float(scale))


def exact_decimal_sum_sql(expr: str, decimals: int = 4) -> str:
    scale = 10**decimals
    return (
        f"sum(CAST(round_even(({expr}) * {scale}, 0) AS BIGINT)) / {float(scale)}"
    )


def exact_money_sum(expr: Column, decimals: int = 4) -> Column:
    """Boundary-safe twin of ``F.round(exact_decimal_sum(e, d), 2)``.

    Rounding AFTER the double division is engine-divergent at the half
    boundary: when the exact sum ends in ...50 at the 10^d scale the
    true quotient sits exactly on x.xx5 — Spark's round() HALF_UPs the
    shortest decimal repr while DuckDB rounds the binary double, and
    the two can land one cent apart (seen live: 285207.035 -> .04 vs
    .03). Here the d-digit -> cents rounding happens where the half is
    EXACTLY representable (BIGINT/1e(d-2) is a true binary .5 whenever
    it matters, for sums < 2^52), so both engines half-even to the same
    cents BIGINT; the final /100.0 is never re-rounded."""
    scale = 10**decimals
    down = float(10 ** (decimals - 2))
    scaled = F.bround(expr * scale, 0).cast("long")
    total = F.sum(scaled)
    # Runtime guard for the exactness precondition above: past 2^52 the
    # BIGINT/1e(d-2) quotient is no longer exactly representable and
    # the half-even argument silently breaks (e.g. a decimals=6 group
    # sum over ~10^9 rows). Fail loudly instead of drifting by a cent.
    # assert_true yields NULL when the bound holds, so the coalesce
    # term adds exactly 0 and the value/plan semantics are unchanged.
    # NULL sums (empty relation under a global aggregate, all-NULL
    # group) must pass through as NULL — assert_true raises on a NULL
    # condition, so the bound check only applies to non-null totals.
    guard = F.assert_true(
        total.isNull() | (F.abs(total) < F.lit(2**52)),
        F.lit(
            f"exact_money_sum: |sum of {scale}-scaled values| >= 2^52; "
            "cent rounding would no longer be exact — lower `decimals` "
            "or split the aggregation"
        ),
    )
    total = total + F.coalesce(guard.cast("long"), F.lit(0).cast("long"))
    cents = F.bround(total / F.lit(down), 0).cast("long")
    return cents / F.lit(100.0)


def exact_money_sum_sql(expr: str, decimals: int = 4) -> str:
    inner = f"CAST(sum(CAST(round_even(({expr}) * {10**decimals}, 0) AS BIGINT)) AS BIGINT)"
    return f"CAST(round_even({inner} / 1e{decimals - 2}, 0) AS BIGINT) / 1e2"
