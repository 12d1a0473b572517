"""Certificate-age dashboard (r11 verdict #8).

For every registered query, compute the LAST round in which the driver
recorded a certificate for it (a row in CORRECTNESS_r{N}.json), and
whether that most-recent certificate was green (hash_match, or
rows_match for the historical rows-only vintage). Emits a markdown
table plus a vintage histogram so the registry._PRIORITY rotation is
measured, not remembered.

Usage:
    python tools/cert_age.py            # print dashboard
    python tools/cert_age.py --stalest 50   # print the 50 stalest names
                                            # (rotation input, one per line)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections import Counter

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_certificates() -> dict[str, list[tuple[int, bool]]]:
    """name -> [(round, green), ...] sorted by round."""
    certs: dict[str, list[tuple[int, bool]]] = {}
    paths = glob.glob(os.path.join(ROOT, "artifacts", "r*", "CORRECTNESS_r*.json"))
    paths += glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))
    for path in sorted(paths):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as fh:
            data = json.load(fh)
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            green = bool(
                row.get("hash_match")
                or (row.get("hash_match") is None and row.get("rows_match"))
            )
            certs.setdefault(name, []).append((rnd, green))
    for rows in certs.values():
        rows.sort()
    return certs


def registry_names() -> list[str]:
    sys.path.insert(0, ROOT)
    from dataframe_retail_e_inventarios_spark import registry

    return list(registry.queries().keys())


def main(argv: list[str]) -> int:
    stalest_n = 0
    if "--stalest" in argv:
        i = argv.index("--stalest")
        if i + 1 >= len(argv):
            print("usage: cert_age.py [--stalest N]", file=sys.stderr)
            return 2
        stalest_n = int(argv[i + 1])

    certs = load_certificates()
    names = registry_names()
    rows = []
    for name in names:
        history = certs.get(name, [])
        if history:
            last_round, green = history[-1]
        else:
            last_round, green = 0, False  # never driver-sampled
        rows.append((last_round, name, green, len(history)))
    # Stalest first; alphabetical within a vintage for determinism.
    rows.sort(key=lambda r: (r[0], r[1]))

    if stalest_n:
        for last_round, name, _green, _n in rows[:stalest_n]:
            print(name)
        return 0

    hist = Counter(r[0] for r in rows)
    print("# Certificate age dashboard")
    print()
    print(f"registered queries: {len(names)}; never-sampled: {hist.get(0, 0)}")
    print()
    print("| last-cert round | queries |")
    print("|---|---|")
    for rnd in sorted(hist):
        label = "never" if rnd == 0 else f"r{rnd}"
        print(f"| {label} | {hist[rnd]} |")
    print()
    print("| query | last cert | green | #certs |")
    print("|---|---|---|---|")
    for last_round, name, green, n in rows:
        label = "never" if last_round == 0 else f"r{last_round}"
        print(f"| {name} | {label} | {'yes' if green else 'NO'} | {n} |")
    stale_not_green = [r for r in rows if not r[2]]
    if stale_not_green:
        print()
        print(f"WARNING: {len(stale_not_green)} queries whose most recent "
              "certificate is not green:")
        for last_round, name, _g, _n in stale_not_green:
            print(f"  - {name} (r{last_round})")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
