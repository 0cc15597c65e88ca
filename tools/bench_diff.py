#!/usr/bin/env python3
"""Per-query bench regression gate.

Compares a fresh Bench JSON line against a previous one (default: the
last committed bench_out.json via `git show HEAD:bench_out.json`) and
prints every query whose time moved by more than THRESH in either
direction, plus queries added/removed. The point is to mechanize the
smear-vs-regression adjudication BASELINE.md describes: a mover listed
here must be re-measured min-of-3 in a clean window before it is
accepted as a regression (or an improvement worth bragging about).

Usage:
  python3 tools/bench_diff.py NEW.json [OLD.json] [--thresh 2.0]

Exit code 1 iff any slowdown exceeds the threshold (so the round-end
checklist can gate on it); new/removed queries and speedups are
informational only.
"""
import json
import subprocess
import sys


def load(path):
    if path == "-":
        return json.load(sys.stdin)
    with open(path) as f:
        return json.load(f)


def main(argv):
    args = [a for a in argv if not a.startswith("--")]
    thresh = 2.0
    for a in argv:
        if a.startswith("--thresh"):
            thresh = float(a.split("=", 1)[1] if "=" in a else argv[argv.index(a) + 1])
    if not args:
        print(__doc__)
        return 2
    new = load(args[0])
    if len(args) > 1:
        old = load(args[1])
        old_name = args[1]
    else:
        out = subprocess.run(
            ["git", "show", "HEAD:bench_out.json"],
            capture_output=True, text=True, check=True)
        old = json.loads(out.stdout)
        old_name = "HEAD:bench_out.json"
    nq, oq = new["queries"], old["queries"]
    print(f"old: {old_name}  total={old['value']:.1f}s  n={len(oq)}")
    print(f"new: {args[0]}  total={new['value']:.1f}s  n={len(nq)}")
    shared = sorted(set(nq) & set(oq))
    shared_old = sum(oq[q] for q in shared)
    shared_new = sum(nq[q] for q in shared)
    if shared and shared_old > 0:
        print(f"shared set: {len(shared)} queries, "
              f"{shared_old:.1f}s -> {shared_new:.1f}s "
              f"(ratio {shared_new / shared_old:.2f})")
    slow, fast = [], []
    for q in shared:
        o, n = oq[q], nq[q]
        if o <= 0:
            continue
        r = n / o
        # ignore sub-0.2s noise in both measurements: the job-submission
        # floor dominates there and ratios are meaningless
        if r >= thresh and n >= 0.2:
            slow.append((r, q, o, n))
        elif r <= 1.0 / thresh and o >= 0.2:
            fast.append((r, q, o, n))
    for r, q, o, n in sorted(slow, reverse=True):
        print(f"SLOWER {r:5.2f}x  {q}: {o:.2f}s -> {n:.2f}s")
    for r, q, o, n in sorted(fast):
        print(f"faster {r:5.2f}x  {q}: {o:.2f}s -> {n:.2f}s")
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print(f"added ({len(added)}): " + ", ".join(added))
    if removed:
        print(f"REMOVED ({len(removed)}): " + ", ".join(removed))
    if not slow:
        print(f"no shared query slower than {thresh}x — clean.")
    return 1 if slow else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
