#!/usr/bin/env python3
"""Diff two graft.Explain audit logs' exchange fingerprints.

Usage:
    python3 tools/check_plans.py OLD_explain.log NEW_explain.log

The Explain main prints one line per catalog entry:
    [plan] q85_pagerank sh=14 bc=5 ok
where sh/bc are the (shuffle, broadcast) exchange counts under
audit-mode planning (AQE off, stat-based broadcast disabled — the
hinted 100 TB shape). PlanBudgetSpec GATES these for headlines; this
tool is the long-tail complement: a round-over-round diff surfaces
shape drift in the other ~300 entries without hand-reading plans.

Exit 1 if any entry present in both logs changed counts, or if an
entry ERRORed in NEW but not in OLD. Added/removed entries and smell
text changes are listed informationally (smells are ExplainSpec's
job to enforce).

m* (ML) entries are diffed INFORMATIONALLY only (ADVICE r12): their
fit() loops flood the execution listener with per-iteration plans —
the exact reason PlanBudgetSpec excludes them ("not any single
query's shape") — so async listener-bus drops or library-internal
iteration-count changes can wobble their sh=/bc= sums without any
real plan drift. q* drift remains a hard failure.
"""
import re
import sys

LINE = re.compile(r"^\[plan\] (\S+) sh=(\d+) bc=(\d+) (.*)$")
ERR = re.compile(r"^\[plan\] (\S+) ERROR")


def parse(path):
    fps, errs = {}, set()
    with open(path) as f:
        for line in f:
            m = LINE.match(line.strip())
            if m:
                fps[m.group(1)] = (int(m.group(2)), int(m.group(3)),
                                   m.group(4).strip())
                continue
            e = ERR.match(line.strip())
            if e:
                errs.add(e.group(1))
    return fps, errs


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    old, old_errs = parse(sys.argv[1])
    new, new_errs = parse(sys.argv[2])
    for label, fps in (("old", old), ("new", new)):
        if not fps:
            # an unparseable OLD baseline would otherwise report every
            # entry as "added (informational)" and exit 0 — a silent
            # false pass of the whole drift gate
            path = sys.argv[1] if label == "old" else sys.argv[2]
            print(f"no fingerprint lines parsed from {label} log {path} "
                  "(pre-round-12 logs lack sh=/bc= — regenerate with "
                  "`sbt -batch \"runMain graft.Explain\"`)")
            return 2
    rc = 0
    moved = sorted(n for n in old.keys() & new.keys()
                   if old[n][:2] != new[n][:2])
    drifted = [n for n in moved if not n.startswith("m")]
    for n in drifted:
        print(f"DRIFT  {n}: sh={old[n][0]}->{new[n][0]} "
              f"bc={old[n][1]}->{new[n][1]}")
        rc = 1
    for n in (n for n in moved if n.startswith("m")):
        print(f"mdrift {n}: sh={old[n][0]}->{new[n][0]} "
              f"bc={old[n][1]}->{new[n][1]} (informational: ML fit() "
              "listener sums are load-sensitive, see module docstring)")
    for n in sorted(new_errs - old_errs):
        print(f"ERROR  {n}: errors in new log only")
        rc = 1
    smell = sorted(n for n in old.keys() & new.keys()
                   if old[n][2] != new[n][2])
    for n in smell:
        print(f"smell  {n}: '{old[n][2]}' -> '{new[n][2]}' (informational)")
    for n in sorted(new.keys() - old.keys()):
        print(f"added  {n}: sh={new[n][0]} bc={new[n][1]} (informational)")
    for n in sorted(old.keys() - new.keys()):
        print(f"gone   {n} (informational)")
    # unchanged + drifted + m-drifted == |old ∩ new| by construction
    # (ADVICE r13: without the explicit m-drift bucket the totals didn't
    # sum when an m* entry wobbled)
    same = len(old.keys() & new.keys()) - len(moved)
    print(f"{same} unchanged, {len(drifted)} drifted, "
          f"{len(moved) - len(drifted)} m-drifted (informational), "
          f"{len(new.keys() - old.keys())} added, "
          f"{len(old.keys() - new.keys())} removed, "
          f"{len(new_errs)} errors")
    return rc


if __name__ == "__main__":
    sys.exit(main())
