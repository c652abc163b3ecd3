#!/usr/bin/env python3
"""Recall drift gate: diff two RECALL_r{N}.json artifacts the way bench and
correctness are diffed across rounds, and FAIL if any operator's headline
recall dropped by more than the tolerance without an accompanying note in
BASELINE.md.

A drop can be legitimate (a pinned fixture shape changed, a guard was
tightened) — but then it must be written down: the gate greps BASELINE.md
for the operator's name and accepts the drop only if a note exists.

Usage: python3 tools/recall_gate.py RECALL_r09.json RECALL_r10.json
       (exit 0 = no unexplained drift; exit 1 = regression)
"""
import json
import pathlib
import re
import sys

TOLERANCE = 0.05


def noted(op: str, notes: str) -> bool:
    """Word-boundary match: 'ann_ivf' must NOT be excused by a note that
    only mentions 'ann_ivfpq' (raw substring tests exempt every op whose
    name is a prefix of a documented one)."""
    return re.search(rf"(?<![A-Za-z0-9_]){re.escape(op)}(?![A-Za-z0-9_])",
                     notes) is not None


def noted_removed(op: str, notes: str) -> bool:
    """A REMOVAL waiver is stricter than a drop waiver: most long-lived op
    names already appear somewhere in BASELINE.md's historical prose, so
    matching the whole file would silently accept almost any accidental
    coverage shrink. Accept only a line that BOTH names the op
    (word-boundary) and declares the retirement ('retired'/'removed' — NOT 'dropped',
    which shows up constantly in perf prose like 'dropped 1.29 -> 0.85')."""
    op_re = re.compile(rf"(?<![A-Za-z0-9_]){re.escape(op)}(?![A-Za-z0-9_])")
    verb_re = re.compile(r"\b(retired?|removed?)\b", re.IGNORECASE)
    return any(op_re.search(line) and verb_re.search(line)
               for line in notes.splitlines())


def main(prev_path: str, curr_path: str, baseline_md: str = "BASELINE.md") -> int:
    prev = json.load(open(prev_path))["ops"]
    curr = json.load(open(curr_path))["ops"]
    try:
        notes = pathlib.Path(baseline_md).read_text()
    except FileNotFoundError:
        notes = ""
    failures = []
    for op, prev_entry in sorted(prev.items()):
        if op not in curr:
            # a REMOVED row needs the same written-down discipline as a
            # drop, on a DEDICATED retirement line: a BASELINE.md line
            # naming the op AND saying retired/removed/dropped (e.g. the
            # r13->r14 near_dedup_semantic_multi alias retirement)
            if noted_removed(op, notes):
                print(f"[recall-gate] {op}: removed "
                      "(retirement noted in BASELINE.md — accepted)")
            else:
                failures.append(
                    f"{op}: present in {prev_path} but MISSING from "
                    f"{curr_path} (recall coverage shrank, no note)")
            continue
        p, c = prev_entry["recall"], curr[op]["recall"]
        delta = c - p
        marker = ""
        if delta < -TOLERANCE:
            if noted(op, notes):
                marker = "  (drop noted in BASELINE.md — accepted)"
            else:
                failures.append(
                    f"{op}: recall {p:.4f} -> {c:.4f} ({delta:+.4f}) with no "
                    f"note in {baseline_md}")
                marker = "  REGRESSION"
        print(f"[recall-gate] {op}: {p:.4f} -> {c:.4f} ({delta:+.4f}){marker}")
    for op in sorted(set(curr) - set(prev)):
        print(f"[recall-gate] {op}: NEW at {curr[op]['recall']:.4f}")
    if failures:
        print(f"\n{len(failures)} unexplained recall regression(s):")
        for f in failures:
            print(f"  {f}")
        return 1
    print("\nno unexplained recall drift")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
