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

# Relocate all but the NEWEST round's bench/correctness/scale files to
# artifacts/rNN/ (r9 verdict #6: the root had 9 rounds of sprawl; the
# driver only ever writes/reads the current round at root).
# `|| true`: under set -euo pipefail a fresh root with no round files
# would kill the script inside the command substitution (r10 review).
latest=$( (ls BENCH_r*.json CORRECTNESS_r*.json BENCH_scale_r*.json 2>/dev/null || true) \
         | sed -E 's/.*_r([0-9]+)\.json/\1/' | sort -n | tail -1)
[ -n "$latest" ] || { git status --short; exit 0; }
moved=0
for f in BENCH_r*.json CORRECTNESS_r*.json BENCH_scale_r*.json; do
    [ -e "$f" ] || continue
    n=$(echo "$f" | sed -E 's/.*_r([0-9]+)\.json/\1/')
    if [ "$((10#$n))" -lt "$((10#$latest))" ]; then
        mkdir -p "artifacts/r$n"
        git mv "$f" "artifacts/r$n/"
        moved=1
    fi
done
if [ "$moved" = 1 ]; then
    git commit -m "Archive prior-round artifacts under artifacts/"
    echo "open_round: prior-round artifacts archived."
fi
git status --short
