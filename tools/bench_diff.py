#!/usr/bin/env python3
"""Per-query bench regression gate.

Compares a fresh Bench JSON line against BOTH baselines that matter:

  1. the last committed bench_out.json (`git show HEAD:bench_out.json`),
  2. the newest driver-graded BENCH_r*.json in the repo root — the file
     the judge actually reads. Driver files store only a truncated
     output tail (`parsed: null`), so per-query times are recovered
     from the tail by regex; the diff prints how many queries were
     recoverable and gates on that shared subset. Partial coverage is
     stated loudly, never silently treated as complete.

Prints every query whose time moved by more than THRESH in either
direction, plus queries added/removed. The point is to mechanize the
smear-vs-regression adjudication BASELINE.md describes: a mover listed
here must be re-measured min-of-3 in a clean window before it is
accepted as a regression (or an improvement worth bragging about).

Usage:
  python3 tools/bench_diff.py NEW.json [OLD.json] [--thresh 2.0]

With no OLD.json, BOTH default baselines are diffed. OLD.json may be a
driver BENCH_r*.json (tail-recovered) or a plain Bench line. Exit code
1 iff any slowdown exceeds the threshold against ANY baseline (so the
round-end checklist can gate on it); new/removed queries and speedups
are informational only.
"""
import glob
import json
import os
import re
import subprocess
import sys


def load(path):
    if path == "-":
        d = json.load(sys.stdin)
    else:
        with open(path) as f:
            d = json.load(f)
    if "queries" in d:
        return d
    # driver-graded BENCH_r*.json: no parsed map, only a truncated
    # output tail — recover whatever per-query timings survive in it.
    # A match must be FOLLOWED by ',' or '}' (the JSON entry boundary):
    # if the truncation cut a number mid-digits ("q_foo":123.45 -> 1),
    # accepting it would record a silently-wrong timing and fake a >2x
    # mover against the driver baseline.
    tail = d.get("tail", "")
    qs = {m.group(1): float(m.group(2)) for m in
          re.finditer(r'"(q[\w]*)":([0-9]+(?:\.[0-9]+)?)(?=[,}])', tail)}
    if not qs:
        raise SystemExit(f"{path}: neither a Bench line (no 'queries') "
                         "nor a recoverable driver tail")
    return {"queries": qs, "value": sum(qs.values()), "partial": True,
            "sf": d.get("sf")}


def latest_driver_bench(root="."):
    """Newest BENCH_r*.json by round number, or None."""
    best, best_n = None, -1
    for p in glob.glob(os.path.join(root, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m and int(m.group(1)) > best_n:
            best, best_n = p, int(m.group(1))
    return best


def diff(new, new_name, old, old_name, thresh):
    nq, oq = new["queries"], old["queries"]
    note = " (PARTIAL: tail-recovered subset)" if old.get("partial") else ""
    print(f"old: {old_name}{note}  total={old['value']:.1f}s  n={len(oq)}")
    print(f"new: {new_name}  total={new['value']:.1f}s  n={len(nq)}")
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
    if added and not old.get("partial"):
        print(f"added ({len(added)}): " + ", ".join(added))
    if removed and not old.get("partial"):
        print(f"REMOVED ({len(removed)}): " + ", ".join(removed))
    if not slow:
        print(f"no shared query slower than {thresh}x — clean.")
    return bool(slow)


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
    baselines = []
    if len(args) > 1:
        baselines.append((load(args[1]), args[1]))
    else:
        # baselines live in the REPO ROOT, not wherever NEW.json sits or
        # the tool is invoked from
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        out = subprocess.run(
            ["git", "show", "HEAD:bench_out.json"], cwd=repo_root,
            capture_output=True, text=True, check=True)
        baselines.append((json.loads(out.stdout), "HEAD:bench_out.json"))
        drv = latest_driver_bench(repo_root)
        if drv:
            baselines.append((load(drv), drv))
        else:
            print(f"NOTE: no BENCH_r*.json found in {repo_root} — "
                  "driver-baseline gate skipped")
    any_slow = False
    for i, (old, old_name) in enumerate(baselines):
        if i:
            print()
        any_slow |= diff(new, args[0], old, old_name, thresh)
    return 1 if any_slow else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
