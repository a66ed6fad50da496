#!/usr/bin/env python3
"""Standing headroom table between any two bench artifacts.

Usage: python3 tools/ratios.py BENCH_A.json BENCH_B.json [ratio_of_scales]

A is the smaller scale factor, B the larger. Prints a markdown table of
every query present in BOTH artifacts: A median, B median, and wall
ratio, sorted by ratio descending, flagging everything over the red
line (> 5x) — the check that exposed round 9's quadratics
(q170/q171/q61/q52) and must run at EVERY adjacent rung pair so the
next quadratic is caught by tooling, not by reading raw JSON:

  python3 tools/ratios.py BENCH_LOCAL_r<N>.json BENCH_SF1_r<N>.json   # sf0.1->sf1
  python3 tools/ratios.py BENCH_SF1_r<N>.json  BENCH_SF10_r<N>.json  # sf1->sf10

The optional third arg (default 10) only labels the header — the red
line is on the WALL ratio: at a 10x data step, linear-with-
amortized-overhead queries land well under 5x on this host.
"""
import json
import os
import sys

RED_LINE = 5.0


def medians(path):
    d = json.load(open(path))
    return d["queries"] if "queries" in d else d


def main():
    loc, big = medians(sys.argv[1]), medians(sys.argv[2])
    step = sys.argv[3] if len(sys.argv) > 3 else "10"
    la = os.path.basename(sys.argv[1]).replace(".json", "")
    lb = os.path.basename(sys.argv[2]).replace(".json", "")
    rows = []
    uncompared = []
    zero_median = []
    for q, t1 in big.items():
        t0 = loc.get(q)
        # `is not None`, not truthiness: a 0.0 median is present, not
        # missing (ADVICE r14) — report it as incomparable rather than
        # misfiling it under "only in B"
        if t0:
            rows.append((t1 / t0, q, t0, t1))
        elif t0 is not None:
            print(f"WARNING: {q} has a 0.0 median in {la}; "
                  "ratio undefined, excluded from the table")
            zero_median.append(q)
        else:
            uncompared.append(q)
    only_a = [q for q in loc if q not in big]
    rows.sort(reverse=True)
    flagged = [r for r in rows if r[0] > RED_LINE]
    print(f"| query | {la} s | {lb} s | ratio ({step}x data) |")
    print("|---|---|---|---|")
    for r, q, t0, t1 in rows:
        flag = " **RED**" if r > RED_LINE else ""
        print(f"| {q} | {t0:.2f} | {t1:.2f} | {r:.1f}x{flag} |")
    print()
    print(f"{len(flagged)} quer{'y' if len(flagged)==1 else 'ies'} over "
          f"the {RED_LINE:.0f}x red line "
          f"({', '.join(q for _, q, _, _ in flagged) or 'none'}).")
    # coverage accounting: a typo'd bench filter must not silently
    # shrink the compared set (r14 review finding); zero-median
    # exclusions are counted too (ADVICE r15) so every query in B is
    # accounted for by exactly one bucket
    zm = (f"; {len(zero_median)} zero-median excluded "
          f"({', '.join(sorted(zero_median)[:8])})" if zero_median else "")
    print(f"{len(rows)} compared; {len(uncompared)} only in {lb}"
          f"{' (' + ', '.join(sorted(uncompared)[:8]) + ')' if uncompared else ''}; "
          f"{len(only_a)} only in {la}{zm}.")


if __name__ == "__main__":
    main()
