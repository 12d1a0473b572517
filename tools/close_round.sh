#!/bin/bash
# Round-close evidence runner (r7 verdict #2: artifact commits must be
# scripted, not remembered). Runs the four selfcheck sweeps, the bench,
# the scale curve and the plan dump, then stages every artifact so the
# closing `git status` is clean the moment the round ends.
#
#   bash tools/close_round.sh [round_tag]
#
# Each step overwrites its canonical artifact file; failures abort so a
# half-refreshed evidence set is never committed silently.
set -euo pipefail
cd "$(dirname "$0")/.."
TAG="${1:-rX}"

echo "== full sf0.01 selfcheck =="
python tools/selfcheck.py --json SELFCHECK_full.json /root/testdata/sf0.01

echo "== hostile-TZ selfcheck (process + session America/New_York) =="
TZ=America/New_York SPARK_GRAFT_SESSION_TZ=America/New_York \
  python tools/selfcheck.py --json SELFCHECK_tz.json /root/testdata/sf0.01

echo "== partitioning-invariance selfcheck (local[3], 4 shuffle partitions) =="
SPARK_GRAFT_CPUS=3 \
  python tools/selfcheck.py --json SELFCHECK_part.json /root/testdata/sf0.01

echo "== sf0.1 headline selfcheck =="
python tools/selfcheck.py --headline --json SELFCHECK_sf01.json /root/testdata/sf0.1

echo "== legacy-mode selfcheck (spark.sql.ansi.enabled=false — Spark 4 defaults to TRUE) =="
SPARK_GRAFT_ANSI=false \
  python tools/selfcheck.py --json SELFCHECK_ansi.json /root/testdata/sf0.01

echo "== bench (BENCH_full.json) =="
python bench.py

echo "== scale curve =="
python tools/make_scale10.py /root/testdata/sf0.1 10
python bench.py --scale-curve "BENCH_scale_${TAG}.json"

echo "== plan dump =="
python tools/explain_plans.py

git add SELFCHECK_full.json SELFCHECK_tz.json SELFCHECK_part.json \
        SELFCHECK_sf01.json SELFCHECK_ansi.json BENCH_full.json \
        "BENCH_scale_${TAG}.json" PLANS.md
git add -f BENCH_r*.json CORRECTNESS_r*.json 2>/dev/null || true
git status --short
echo "close_round: artifacts staged — commit them now."
