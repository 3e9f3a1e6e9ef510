#!/usr/bin/env python3
"""Compare a graft.Bench JSON line against BASELINE.md's committed
per-query loaded envelope (the 2x-gate anchor).

Usage:
    python3 tools/check_bench.py BENCH_rN.json [BASELINE.md]
    ... | grep '"metric"' | python3 tools/check_bench.py -    # from stdin

Exit 0 if every benched headline is within WARN_RATIO of its envelope,
1 otherwise. Queries without a committed envelope (non-headline /
BENCH_ONLY extras) are listed informationally.
"""
import json
import re
import sys

WARN_RATIO = 1.5   # BASELINE.md: ">1.5x over the envelope is a real regression"
GATE_RATIO = 2.0   # the driver's hard gate


def parse_envelope(baseline_md):
    txt = open(baseline_md).read()
    m = re.search(r"LOADED ENVELOPE[^|]*\|([^|]*)\|", txt)
    if not m:
        raise SystemExit(f"no LOADED ENVELOPE row found in {baseline_md}")
    cell = m.group(1)
    out = {}
    for qm in re.finditer(r"(q\d+)\s+([0-9.]+)", cell):
        out[qm.group(1)] = float(qm.group(2))
    if not out:
        raise SystemExit("envelope row matched but no 'qNN sec' pairs parsed")
    return out


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "-"
    baseline = sys.argv[2] if len(sys.argv) > 2 else "BASELINE.md"
    raw = sys.stdin.read() if src == "-" else open(src).read()
    line = next(l for l in raw.splitlines() if '"metric"' in l)
    bench = json.loads(line)
    envelope = parse_envelope(baseline)

    worst = 0.0
    failures, warnings, extras = [], [], []
    for name, secs in sorted(bench["queries"].items()):
        short = name.split("_")[0]
        if secs is None:
            failures.append(f"{name}: FAILED in bench (null)")
            continue
        if short not in envelope:
            extras.append(f"{name}: {secs:.3f}s (no committed envelope)")
            continue
        ratio = secs / envelope[short]
        worst = max(worst, ratio)
        tag = ("FAIL(gate)" if ratio > GATE_RATIO
               else "WARN" if ratio > WARN_RATIO else "ok")
        msg = f"{name}: {secs:.3f}s vs envelope {envelope[short]:.2f}s = {ratio:.2f}x {tag}"
        if ratio > GATE_RATIO:
            failures.append(msg)
        elif ratio > WARN_RATIO:
            warnings.append(msg)
        print(" ", msg)
    for e in extras:
        print("  [extra]", e)
    if bench.get("errors"):
        failures.append(f"bench errors: {bench['errors']}")

    print(f"\nworst ratio {worst:.2f}x; "
          f"{len(failures)} over {GATE_RATIO}x, {len(warnings)} over {WARN_RATIO}x")
    if failures:
        for f in failures:
            print("FAIL", f)
        sys.exit(1)
    print("all benched headlines within the committed envelope band")


if __name__ == "__main__":
    main()
