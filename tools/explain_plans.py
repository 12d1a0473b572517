"""Dump formatted physical plans of the headline queries to PLANS.md —
the artifact for reviewing scan pruning (ReadSchema/PushedFilters),
join strategies, exchange counts, and codegen coverage without
re-running anything. Usage: python tools/explain_plans.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from bench import HEADLINE
from dataframe_retail_e_inventarios_spark.registry import queries
from dataframe_retail_e_inventarios_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("explain")
    qs = queries()
    out = ["# PLANS — formatted physical plans of the headline queries\n"]
    out.append(f"Generated against `{sf_dir}` (plan shape is sf-independent).\n")
    for name in HEADLINE:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        n_exchange = plan.count("Exchange")
        out.append(f"\n## {name}  (exchange mentions: {n_exchange})\n")
        out.append("```\n" + plan.strip() + "\n```\n")
    with open("PLANS.md", "w") as f:
        f.write("".join(out))
    print(f"wrote PLANS.md ({len(HEADLINE)} queries)")


if __name__ == "__main__":
    main()
