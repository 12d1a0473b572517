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
