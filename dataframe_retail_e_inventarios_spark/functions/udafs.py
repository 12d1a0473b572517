"""pandas GROUPED_AGG UDF definitions (Series -> scalar aggregates).

Two deliberate quirks:
- NO ``from __future__ import annotations`` — pandas_udf infers the
  aggregate signature from EVALUATED type hints; postponed
  (stringified) annotations break the inference.
- UDFs are built lazily via factories — ``@pandas_udf`` parses its DDL
  return type against the active SparkSession at decoration time, so a
  module-level decorator would force a session to exist at import.
"""

from functools import lru_cache

import numpy as np
import pandas as pd


@lru_cache(maxsize=1)
def sum_scaled_log_udf():
    """GROUPED_AGG aggregate: exact scaled-BIGINT sum of ln(x). Each
    element's log is rounded at 1e-6 then summed as int64, so the
    result is independent of Arrow batch boundaries and accumulation
    order."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def sum_scaled_log(v: pd.Series) -> int:
        a = np.log(v.to_numpy(dtype=float)) * 1e6
        # round half-AWAY from zero to match the DuckDB oracle's
        # round() (np.round is half-even). floor(abs+0.5) is NOT it:
        # the addition rounds up for doubles just below a tie (e.g.
        # 0.49999999999999994 + 0.5 == 1.0). frac = |a| - floor(|a|)
        # is exact in IEEE for |a| < 2^52, so compare the fraction
        # itself — bit-for-bit std::round semantics.
        f = np.floor(np.abs(a))
        r = np.copysign(np.where(np.abs(a) - f >= 0.5, f + 1.0, f), a)
        return int(r.astype(np.int64).sum())

    return sum_scaled_log
