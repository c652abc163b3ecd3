#!/usr/bin/env python3
"""Run the wall-clock scaling probe (graft.Scaling) and gate the result.

Usage:  python3 tools/scaling.py SCALING_r11.json  [--check-only]

Without --check-only it invokes `sbt runMain graft.Scaling <out>` (which
times the top-10 bench queries at sf0.01 / sf0.1 / a synthesized
10x-sf0.1 corpus — plus a 100x point for the three declared non-events
heavy hitters — and fits per-query scaling exponents; since round 12 the
timed action is a noop-format WRITE, materializing every output column,
so per-row expression cost counts — exponents are comparable across
rounds, raw seconds across the r11->r12 convention change are not), then
applies the gate below. With --check-only it only re-applies the gate to
an existing artifact.

Gate: every query whose fitted exponent exceeds SUPERLINEAR_MAX must be
excused by a word-boundary mention in BASELINE.md's scaling notes (the
recall_gate.py discipline): an undocumented superlinear heavy hitter is
exactly the 100 TB regression this probe exists to catch.
"""
import json
import re
import subprocess
import sys

SUPERLINEAR_MAX = 1.15


def gate(path: str) -> int:
    with open(path) as f:
        data = json.load(f)
    try:
        with open("BASELINE.md") as f:
            baseline = f.read()
    except FileNotFoundError:
        baseline = ""
    bad = []
    for name, rec in data.items():
        if name == "meta" or not isinstance(rec, dict):
            continue
        # a query that CRASHED at some scale is strictly worse than a
        # superlinear one — a failed point or missing exponent fails the
        # gate outright, it doesn't downgrade to a warning
        failed = [p["scale"] for p in rec.get("points", [])
                  if p.get("sec", -1) < 0]
        if failed:
            print(f"[scaling] FAIL {name}: crashed at scale(s) {failed}")
            bad.append((name, float("inf")))
            continue
        exp = rec.get("exponent")
        if exp is None:
            print(f"[scaling] FAIL {name}: no exponent fitted")
            bad.append((name, float("inf")))
            continue
        flag = "SUPERLINEAR" if exp > SUPERLINEAR_MAX else "ok"
        print(f"[scaling] {name:<36} exponent={exp:6.3f}  {flag}")
        if exp > SUPERLINEAR_MAX:
            # word-boundary: 'stream_cc' must not excuse 'stream_cc_foo'
            if not re.search(rf"(?<![A-Za-z0-9_]){re.escape(name)}(?![A-Za-z0-9_])",
                             baseline):
                bad.append((name, exp))
    if bad:
        for name, exp in bad:
            if exp != float("inf"):
                print(f"[scaling] FAIL {name}: exponent {exp:.3f} > "
                      f"{SUPERLINEAR_MAX} with no BASELINE.md note")
        return 1
    print("[scaling] gate: pass")
    return 0


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out = args[0] if args else "SCALING.json"
    if "--check-only" not in sys.argv:
        rc = subprocess.call(
            ["sbt", "-batch", f"runMain graft.Scaling {out}"])
        if rc != 0:
            print(f"[scaling] sbt run failed rc={rc}")
            return rc
    return gate(out)


if __name__ == "__main__":
    sys.exit(main())
