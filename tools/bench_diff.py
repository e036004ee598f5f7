#!/usr/bin/env python3
"""Compare two Bench JSON lines (e.g. BENCH_local_r3.json vs _r4.json).

Usage: python3 tools/bench_diff.py OLD.json NEW.json [threshold]
Prints per-query ratios for queries present in both (sorted by regression),
plus added/removed queries and totals. threshold (default 2.0) marks
regressions; exit code 1 if any common query regressed past it — useful as
a local perf gate before committing an optimizer change.

Interpret with BASELINE.md's caveat in mind: identical code has measured
1.5x-50x apart under host contention, so re-run quiet before believing a
flagged regression.
"""
import json
import sys


def main(old_path, new_path, threshold=2.0):
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq), key=lambda k: nq[k] / oq[k],
                    reverse=True)
    print(f"common queries: {len(common)}  "
          f"added: {len(set(nq) - set(oq))}  removed: {len(set(oq) - set(nq))}")
    flagged = []
    for k in common:
        r = nq[k] / oq[k]
        mark = ""
        if r >= threshold:
            mark = "  <-- REGRESSED"
            flagged.append(k)
        elif r <= 1 / threshold:
            mark = "  (faster)"
        if r >= threshold or r <= 1 / threshold:
            print(f"  {oq[k]:7.2f}s -> {nq[k]:7.2f}s  {r:5.2f}x  {k}{mark}")
    tot_o = sum(oq[k] for k in common)
    tot_n = sum(nq[k] for k in common)
    print(f"common-query total: {tot_o:.1f}s -> {tot_n:.1f}s "
          f"({tot_n / tot_o:.2f}x)")
    for k in sorted(set(nq) - set(oq)):
        print(f"  new: {nq[k]:6.2f}s  {k}")
    return 1 if flagged else 0


if __name__ == "__main__":
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    sys.exit(main(sys.argv[1], sys.argv[2], thr))
