#!/usr/bin/env python3
"""Standing sf0.1 -> sf1 headroom table for BASELINE.md.

Usage: python3 tools/ratios.py BENCH_LOCAL_r<N>.json BENCH_SF1_r<N>.json

Prints a markdown table of every query's sf0.1 median, sf1 median, and
wall ratio at 10x data, sorted by ratio descending, flagging everything
over the red line (> 5x) — the check that exposed round 9's quadratics
(q170/q171/q61/q52) and must run every round so the next one can't hide.
"""
import json
import sys

RED_LINE = 5.0


def medians(path):
    d = json.load(open(path))
    return d["queries"] if "queries" in d else d


def main():
    loc, sf1 = medians(sys.argv[1]), medians(sys.argv[2])
    rows = []
    for q, t1 in sf1.items():
        t0 = loc.get(q)
        if t0:
            rows.append((t1 / t0, q, t0, t1))
    rows.sort(reverse=True)
    flagged = [r for r in rows if r[0] > RED_LINE]
    print("| query | sf0.1 s | sf1 s | ratio (10x data) |")
    print("|---|---|---|---|")
    for r, q, t0, t1 in rows:
        flag = " **RED**" if r > RED_LINE else ""
        print(f"| {q} | {t0:.2f} | {t1:.2f} | {r:.1f}x{flag} |")
    print()
    print(f"{len(flagged)} quer{'y' if len(flagged)==1 else 'ies'} over "
          f"the {RED_LINE:.0f}x red line "
          f"({', '.join(q for _, q, _, _ in flagged) or 'none'}).")


if __name__ == "__main__":
    main()
