"""Stream-stream join STATE stress at 8x key cardinality (r8 verdict
#4): prove the bounded twin's eviction story.

The claim under test: `streaming_view_purchase_join_bounded` keeps
peak state ~proportional to rows PER TIME BUCKET (watermark-window
bounded — more users in the same time span just means fatter buckets,
evicted on schedule), while the span-exceeding-watermark replay twin
buffers EVERYTHING (peak state ~ corpus, so ~8x under the 8x fixture).

    python tools/stream_state_stress.py [K] [base_sf_dir]

Reuses tools/scale_stress.build_scaled's key-shifted K-times events
fixture and reads per-batch `stateOperators.numRowsTotal` from each
drain's recentProgress (the progress_out hook on both registered
functions). Prints one JSON line for SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataframe_retail_e_inventarios_spark.plans.queries_warehouse import (
    q_streaming_view_purchase_join,
    q_streaming_view_purchase_join_bounded,
)
from dataframe_retail_e_inventarios_spark.session import get_spark
from tools.scale_stress import build_scaled, scaled_fixture_dir


def peak_state(progresses: list) -> int:
    best = 0
    for p in progresses:
        if isinstance(p, str):
            p = json.loads(p)
        ops = p.get("stateOperators") or []
        best = max(best, sum(int(o.get("numRowsTotal", 0)) for o in ops))
    return best


def run(fn, spark, sf_dir: str) -> tuple[int, int]:
    prog: list = []
    rows = fn(spark, sf_dir, progress_out=prog).count()
    return peak_state(prog), rows


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    # Shared versioned fixture path (r9 ADVICE): cache-busting renames
    # in scale_stress now invalidate THIS harness's cache too.
    scaled = scaled_fixture_dir(k)
    spark = get_spark("stream-state-stress")
    build_scaled(spark, base, k, scaled)

    out = {"metric": "stream_join_peak_state_rows", "k": k}
    for label, sf_dir in (("base", base), (f"{k}x", scaled)):
        ps_b, rows_b = run(q_streaming_view_purchase_join_bounded, spark, sf_dir)
        ps_r, rows_r = run(q_streaming_view_purchase_join, spark, sf_dir)
        out[label] = {
            "bounded_peak_state": ps_b,
            "bounded_rows": rows_b,
            "replay_peak_state": ps_r,
            "replay_rows": rows_r,
        }
        print(f"[{label}] bounded peak={ps_b} rows={rows_b} | "
              f"replay peak={ps_r} rows={rows_r}")
    b0 = out["base"]["bounded_peak_state"] or 1
    r0 = out["base"]["replay_peak_state"] or 1
    out["bounded_state_ratio"] = round(out[f"{k}x"]["bounded_peak_state"] / b0, 2)
    out["replay_state_ratio"] = round(out[f"{k}x"]["replay_peak_state"] / r0, 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
