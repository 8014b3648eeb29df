"""Per-query diff of two bench JSON files (BENCH_r*.json or bench.py
output). Round totals are NOT comparable when the entry set grows
(learned in r04→r05), so this compares the INTERSECTION per-query and
lists added/removed entries separately.

Usage:
    python bench/compare.py BENCH_r04.json BENCH_r05.json [--pct 20]

Flags entries whose wall moved more than --pct in either direction.
Exit code is always 0 — this is a reading aid, not a gate (host weather
on this VM routinely moves sub-second entries ±50%; see
BENCH/ANALYSIS_r5.md §6 before attributing a regression to the engine).
"""

from __future__ import annotations

import argparse
import json


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:  # driver-recorded BENCH_r*.json wrapper
        d = d["parsed"]
    d = d.get("queries", d)
    return {k: v for k, v in d.items() if isinstance(v, (int, float))}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--pct", type=float, default=20.0)
    args = ap.parse_args()
    qo, qn = load(args.old), load(args.new)
    shared = sorted(set(qo) & set(qn), key=lambda k: -max(qo[k], qn[k]))
    print(f"{'query':34} {'old':>8} {'new':>8} {'delta%':>8}")
    flagged = []
    so = sn = 0.0
    for k in shared:
        o, n = float(qo[k]), float(qn[k])
        so, sn = so + o, sn + n
        pct = 100.0 * (n - o) / o if o else float("inf")
        mark = ""
        if abs(pct) >= args.pct and max(o, n) >= 0.5:
            mark = " <<"
            flagged.append((k, o, n, pct))
        print(f"{k:34} {o:8.2f} {n:8.2f} {pct:+8.1f}{mark}")
    print(f"{'SHARED TOTAL':34} {so:8.2f} {sn:8.2f} "
          f"{100.0 * (sn - so) / so if so else 0:+8.1f}")
    for label, s in (("added", set(qn) - set(qo)), ("removed", set(qo) - set(qn))):
        if s:
            extra = sum(float((qn if label == "added" else qo)[k]) for k in s)
            print(f"{label}: {sorted(s)} (sum {extra:.2f}s)")
    if flagged:
        print(f"\nmoved >= {args.pct}% (and >= 0.5s):")
        for k, o, n, pct in sorted(flagged, key=lambda x: -abs(x[3])):
            print(f"  {k}: {o:.2f} -> {n:.2f} ({pct:+.1f}%)")


if __name__ == "__main__":
    main()
