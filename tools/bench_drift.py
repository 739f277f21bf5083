#!/usr/bin/env python3
"""Per-query bench drift report between two BENCH_LOCAL-style snapshots,
normalized by each run's MACHINE-STATE CALIBRATION before flagging.

Usage:
    python3 tools/bench_drift.py bench_history/BENCH_LOCAL_r09.json \
        bench_history/BENCH_LOCAL_r10.json [--threshold 1.5] [--min-sec 0.5] \
        [--no-calibration]

Why calibration: two same-code full-suite runs on this box disagree by up
to ~10%% whole-run (SCALING.md round-10 note), which at a 1.5x per-query
threshold painted 8 untouched queries as regressions in r9->r10. Each
bench run now times three FIXED synthetic probes (cpu_hash, shuffle_agg,
task_sched — code-invariant by construction) first/mid/last and records
them under "calibration". This tool computes the run-state factor

    cal = median(new-run samples) / median(old-run samples)   (per probe,
          then the median across probes)

and divides every per-query new/old ratio by it before applying the
threshold. Raw ratios are still printed next to corrected ones.

Retroactive fallback: snapshots older than the calibration field carry no
probes. For those the factor falls back to the MEDIAN of the shared
per-query ratios themselves (queries >= min-sec) — robust to a handful of
genuine movers — CAPPED to [1/1.35, 1.35]: the measured environment band
is ~±10%%, so a proxy beyond ±35%% is no longer credibly "machine state"
and is not normalized away (a true whole-suite code regression must stay
visible; recorded calibration, being code-invariant, needs no cap).

Exit code 1 when any CORRECTED above-threshold drift is found, so the
round gate can fail loudly on an unexplained regression.
"""
import argparse
import json
import statistics
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d.get("queries", {}), d


def cal_median(meta):
    """Median of all recorded calibration samples per probe -> dict."""
    cal = meta.get("calibration")
    if not isinstance(cal, dict) or not cal:
        return None
    out = {}
    for probe, samples in cal.items():
        if isinstance(samples, list) and samples:
            out[probe] = statistics.median(samples)
    return out or None


def run_state_factor(old_meta, new_meta, shared_ratios, cap=1.35):
    """(factor, source-description). factor multiplies OLD times to get
    the new run's machine state: corrected_ratio = raw_ratio / factor."""
    oc, nc = cal_median(old_meta), cal_median(new_meta)
    if oc and nc:
        per_probe = [nc[p] / oc[p] for p in sorted(set(oc) & set(nc)) if oc[p] > 0]
        if per_probe:
            return statistics.median(per_probe), (
                "recorded calibration (" +
                ", ".join(f"{p} {nc[p]/oc[p]:.3f}x"
                          for p in sorted(set(oc) & set(nc)) if oc[p] > 0) + ")")
    if shared_ratios:
        raw = statistics.median(shared_ratios)
        capped = min(max(raw, 1.0 / cap), cap)
        note = "" if capped == raw else f", capped from {raw:.3f}x"
        return capped, (f"proxy: median of {len(shared_ratios)} shared "
                        f"per-query ratios{note} (no calibration recorded)")
    return 1.0, "none (no calibration, no shared queries)"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--min-sec", type=float, default=0.5)
    ap.add_argument("--no-calibration", action="store_true",
                    help="flag on raw ratios (pre-round-11 behavior)")
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

    shared = sorted(set(old_q) & set(new_q))
    shared_ratios = [new_q[q] / old_q[q] for q in shared
                     if old_q[q] > 0 and max(old_q[q], new_q[q]) >= args.min_sec]
    if args.no_calibration:
        factor, source = 1.0, "disabled (--no-calibration)"
    else:
        factor, source = run_state_factor(old_meta, new_meta, shared_ratios)
    print(f"run-state factor: {factor:.3f}x — {source}")

    # a flag requires BOTH the raw and the corrected ratio outside the
    # band in the SAME direction: a genuine mover exceeds both (raw 2x is
    # still ~1.75x corrected), while a machine-state artifact fails the
    # corrected test and a division-created artifact (a mildly-fast query
    # pushed under 1/threshold by the factor alone) fails the raw test
    drifted = []
    for q in shared:
        o, n = old_q[q], new_q[q]
        if max(o, n) < args.min_sec:
            continue
        raw = n / o if o > 0 else float("inf")
        corrected = raw / factor
        slower = raw > args.threshold and corrected > args.threshold
        faster = raw < 1.0 / args.threshold and corrected < 1.0 / args.threshold
        if slower or faster:
            drifted.append((q, o, n, raw, corrected))
    drifted.sort(key=lambda t: -max(t[4], 1.0 / t[4]))

    if drifted:
        print(f"\n{len(drifted)} queries drifted past {args.threshold}x "
              f"after run-state correction (ignoring <{args.min_sec}s in both):")
        for q, o, n, raw, corr in drifted:
            arrow = "SLOWER" if corr > 1 else "faster"
            print(f"  {q}: {o:.2f}s -> {n:.2f}s "
                  f"(raw {raw:.2f}x, corrected {corr:.2f}x {arrow})")
    else:
        print(f"\nno per-query drift past {args.threshold}x after run-state "
              f"correction (ignoring <{args.min_sec}s in both)")
    shared_old = sum(old_q[q] for q in shared)
    shared_new = sum(new_q[q] for q in shared)
    if shared_old > 0:
        print(f"shared-query total: {shared_old:.1f}s -> {shared_new:.1f}s "
              f"({shared_new / shared_old:.3f}x raw, "
              f"{shared_new / shared_old / factor:.3f}x corrected)")
    return 1 if any(c > args.threshold for _, _, _, _, c in drifted) else 0


if __name__ == "__main__":
    sys.exit(main())
