#!/usr/bin/env python3
"""Build the per-query bench BUDGET table from two idle-box BENCH_DETAIL
runs (round-11 verdict #1: replace drifting-total adjudication with a
pinned per-query budget the gate reads).

Usage: python3 tools/budget_table.py run1.json run2.json [r9.json r10.json]

Budget = max over the two runs of the per-run MEDIAN (each median is
already a 3-pass median, so the budget is the worse of two quiet-box
medians — a tight but reproducible anchor). The gate rule emitted with
the table:

  - queries >= 1.0 s budget: flag at > 1.5x budget
  - queries <  1.0 s budget: flag at > max(2.5x budget, budget + 1.0 s)
    (sub-second timings are scheduling-noise-dominated; absolute slack
    beats a ratio there)

Prints a markdown table sorted by budget desc plus totals.
"""
import json
import sys


def load(path):
    d = json.load(open(path))
    return d["queries"]


def main():
    run1, run2 = load(sys.argv[1]), load(sys.argv[2])
    names = sorted(set(run1) | set(run2))
    rows = []
    for n in names:
        a, b = run1.get(n), run2.get(n)
        vals = [v for v in (a, b) if v is not None and v >= 0]
        if not vals:
            continue
        budget = max(vals)
        gate = budget * 1.5 if budget >= 1.0 else max(budget * 2.5, budget + 1.0)
        rows.append((n, a, b, budget, gate))
    rows.sort(key=lambda r: -r[3])
    print("| query | run1 s | run2 s | budget s | flag above s |")
    print("|---|---|---|---|---|")
    for n, a, b, budget, gate in rows:
        fa = "-" if a is None else f"{a:.2f}"
        fb = "-" if b is None else f"{b:.2f}"
        print(f"| {n} | {fa} | {fb} | {budget:.2f} | {gate:.2f} |")
    t1 = sum(v for v in run1.values() if v and v > 0)
    t2 = sum(v for v in run2.values() if v and v > 0)
    print(f"\ntotals: run1 {t1:.1f} s ({len(run1)} queries), "
          f"run2 {t2:.1f} s ({len(run2)} queries)")
    if len(sys.argv) > 3:
        old = load(sys.argv[3])
        common = [n for n in names if n in old and old[n] and old[n] > 0
                  and n in run1 and run1[n] and run1[n] > 0]
        ratio = sum(run1[n] for n in common) / sum(old[n] for n in common)
        print(f"common-{len(common)} drift vs {sys.argv[3]}: {ratio:.2f}x")


if __name__ == "__main__":
    main()
