#!/usr/bin/env python3
"""Row-level bench regression diff (dev harness).

Usage: bench_diff.py <old_detail.json> <new_detail.json> [threshold]

Compares two bench detail files (BENCH_DETAIL_r{N}.json or a working
bench_detail.json) on their common query set: prints the common-subset
totals/ratio and every query whose time moved by more than `threshold`
seconds AND more than 25% in either direction. This is the instrument
BASELINE.md's round-10 note prescribes: single-session totals swing
±15-20% between clean-cal host windows, so only row-level deltas that
clear both an absolute and a relative bar are worth chasing.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d.get("queries", d), d.get("probes", {})


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(1)
    (old, pold), (new, pnew) = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    common = sorted(set(old) & set(new))
    so, sn = sum(old[k] for k in common), sum(new[k] for k in common)
    if not common:
        print("no common queries")
    else:
        ratio = f"{sn / so:.2f}" if so else "n/a (zero baseline total)"
        print(f"common {len(common)} queries: {so:.1f}s -> {sn:.1f}s "
              f"(ratio {ratio})")
    print(f"only-old: {sorted(set(old) - set(new))}")
    print(f"only-new: {sorted(set(new) - set(old))}")
    moved = []
    for k in common:
        a, b = old[k], new[k]
        if abs(b - a) > thr and (a == 0 or abs(b - a) / max(a, 1e-9) > 0.25):
            moved.append((b - a, k, a, b))
    # per-query trust probes (round 15): a mover whose probe on either
    # side is 2x+ the session's median probe was hit by a host CPU-steal
    # burst in that run -- annotate so nobody chases window noise
    def probe_note(k):
        notes = []
        for tag, ps in (("old", pold), ("new", pnew)):
            if k in ps and ps:
                med = sorted(ps.values())[len(ps) // 2]
                if med > 0 and ps[k] > 2 * med:
                    notes.append(f"{tag} probe {ps[k]:.2f} = "
                                 f"{ps[k] / med:.1f}x session median")
        return f"  [BURST: {'; '.join(notes)}]" if notes else ""
    for d, k, a, b in sorted(moved, reverse=True):
        print(f"  {k}: {a:.2f} -> {b:.2f} ({d:+.2f}s){probe_note(k)}")
    if not moved:
        print(f"  no row moved more than {thr}s and 25%")


if __name__ == "__main__":
    main()
