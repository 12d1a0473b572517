#!/bin/bash
# Round-OPEN artifact adoption (r8 verdict #2: the driver drops
# BENCH_r{N}.json / CORRECTNESS_r{N}.json / VERDICT.md / ADVICE.md into
# the worktree between rounds; adopting them must be a scripted first
# commit, not a habit).
#
#   bash tools/open_round.sh
#
# Idempotent: stages any driver-written round artifacts plus judge
# output, commits only if something is actually staged, and refreshes
# BENCH_full.json's pointer freshness check is left to close_round.sh.
set -euo pipefail
cd "$(dirname "$0")/.."

# One add per path: `git add a b c` is all-or-nothing on a pathspec
# failure, so a single absent file would silently stage NOTHING (the
# exact failure mode this script exists to prevent).
for f in BENCH_r*.json CORRECTNESS_r*.json VERDICT.md ADVICE.md PROGRESS.jsonl; do
    [ -e "$f" ] && git add -f "$f"
done

if git diff --cached --quiet; then
    echo "open_round: nothing to adopt — driver artifacts already committed."
else
    git commit -m "Adopt driver round artifacts (bench/correctness/verdict/advice)"
    echo "open_round: driver artifacts committed."
fi
git status --short
