#!/usr/bin/env python
"""Per-query bench deltas between two BENCH_FULL captures.

The driver's BENCH_r{N}.json keeps only a stdout tail, so round-over-
round comparisons used to be judge-side archaeology.  bench.py now
writes the full per-query median map to BENCH_FULL.json every run;
snapshot it per round (BENCH_FULL_r{N}.json) and diff here:

    python tools/bench_diff.py BENCH_FULL_r05.json BENCH_FULL.json

Prints queries sorted by worst regression ratio, flagging anything
over the --flag threshold (default 1.5x, past this box's ~±20%
run-to-run noise band) plus queries added/removed between captures.
Exits 1 if any flagged regression exists (so the round workflow can
gate on it), 0 otherwise.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--flag", type=float, default=1.5,
                    help="regression ratio to flag (default 1.5)")
    ap.add_argument("--min-sec", type=float, default=0.5,
                    help="ignore queries faster than this in BOTH "
                         "captures (sub-second noise, default 0.5)")
    args = ap.parse_args()

    old = json.load(open(args.old))["queries"]
    new = json.load(open(args.new))["queries"]

    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    shared = sorted(set(old) & set(new))

    rows = []
    for name in shared:
        o, n = old[name], new[name]
        if max(o, n) < args.min_sec:
            continue
        rows.append((n / o if o else float("inf"), name, o, n))
    rows.sort(reverse=True)

    flagged = [r for r in rows if r[0] >= args.flag]
    print(f"old total {sum(old.values()):.1f}s ({len(old)} queries)  ->  "
          f"new total {sum(new.values()):.1f}s ({len(new)} queries)")
    if added:
        print(f"added: {', '.join(added)}")
    if removed:
        print(f"removed: {', '.join(removed)}")
    print()
    print("| query | old (s) | new (s) | ratio |")
    print("|---|---|---|---|")
    for ratio, name, o, n in rows[:15]:
        mark = "  <-- FLAG" if ratio >= args.flag else ""
        print(f"| {name} | {o:.2f} | {n:.2f} | {ratio:.2f} |{mark}")
    if flagged:
        print(f"\n{len(flagged)} flagged regression(s) >= {args.flag}x — "
              "re-measure in isolation before believing a suite-run number")
        return 1
    print("\nno regressions past the flag threshold")
    return 0


if __name__ == "__main__":
    sys.exit(main())
