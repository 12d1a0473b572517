"""Run every registered query against its DuckDB oracle (or rows-only)
at a given scale factor. Usage:

    python tools/selfcheck.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from dataframe_retail_e_inventarios_spark.registry import oracle_sql, queries
from dataframe_retail_e_inventarios_spark.session import get_spark
from dataframe_retail_e_inventarios_spark.testing import compare_query


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    filters = sys.argv[2:]
    spark = get_spark("selfcheck")
    qs, oracles = queries(), oracle_sql()
    failed = 0
    for name, fn in qs.items():
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            if name in oracles:
                res = compare_query(spark, name, fn, oracles[name], sf_dir)
                ok = res.ok
                print(f"{res}  ({time.time()-t0:.1f}s)")
            else:
                n = fn(spark, sf_dir).count()
                ok = n >= 0
                print(f"[ROWS] {name}: {n} rows  ({time.time()-t0:.1f}s)")
        except Exception as e:
            ok = False
            print(f"[ERR ] {name}: {type(e).__name__}: {str(e)[:500]}")
        failed += (not ok)
    print(f"\n{'ALL OK' if not failed else f'{failed} FAILED'}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
