#!/usr/bin/env python3
"""Per-query bench drift report between two BENCH_LOCAL-style snapshots.

Usage:
    python3 tools/bench_drift.py bench_history/BENCH_LOCAL_r07.json \
        bench_history/BENCH_LOCAL_r08.json [--threshold 1.5] [--min-sec 0.5]

Names every query whose wall time moved by more than `threshold`x between
the two snapshots (default 1.5x, chosen above the measured +-7%%
environment noise floor recorded in SCALING.md), ignoring queries faster
than `min-sec` in BOTH snapshots (sub-second timings are dominated by
scheduling noise). Exit code 1 when any above-threshold drift is found,
so the round gate can fail loudly on an unexplained regression.
"""
import argparse
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d.get("queries", {}), d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--min-sec", type=float, default=0.5)
    args = ap.parse_args()

    old_q, old_meta = load(args.old)
    new_q, new_meta = load(args.new)
    def _sec(meta):
        v = meta.get("value")
        return f"{v:.1f}s" if isinstance(v, (int, float)) else "?"
    print(f"old: {_sec(old_meta)} / {len(old_q)} queries"
          f"   new: {_sec(new_meta)} / {len(new_q)} queries")

    added = sorted(set(new_q) - set(old_q))
    removed = sorted(set(old_q) - set(new_q))
    if added:
        add_cost = sum(new_q[q] for q in added)
        print(f"added ({len(added)}, {add_cost:.1f}s): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")

    drifted = []
    for q in sorted(set(old_q) & set(new_q)):
        o, n = old_q[q], new_q[q]
        if max(o, n) < args.min_sec:
            continue
        ratio = n / o if o > 0 else float("inf")
        if ratio > args.threshold or ratio < 1.0 / args.threshold:
            drifted.append((q, o, n, ratio))
    drifted.sort(key=lambda t: -max(t[3], 1.0 / t[3]))

    if drifted:
        print(f"\n{len(drifted)} queries drifted past {args.threshold}x "
              f"(ignoring <{args.min_sec}s in both):")
        for q, o, n, r in drifted:
            arrow = "SLOWER" if r > 1 else "faster"
            print(f"  {q}: {o:.2f}s -> {n:.2f}s ({r:.2f}x {arrow})")
    else:
        print(f"\nno per-query drift past {args.threshold}x "
              f"(ignoring <{args.min_sec}s in both)")
    shared_old = sum(old_q[q] for q in set(old_q) & set(new_q))
    shared_new = sum(new_q[q] for q in set(old_q) & set(new_q))
    if shared_old > 0:
        print(f"shared-query total: {shared_old:.1f}s -> {shared_new:.1f}s "
              f"({shared_new / shared_old:.3f}x)")
    return 1 if any(r > args.threshold for _, _, _, r in drifted) else 0


if __name__ == "__main__":
    sys.exit(main())
