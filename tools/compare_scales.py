#!/usr/bin/env python3
"""Compare two graft.Bench JSON outputs (e.g. sf0.1 vs the 10x sf1
probe) and print per-query scaling ratios, flagging anything above a
threshold. Usage:

  python3 tools/compare_scales.py base.json scaled.json [threshold]

Lines are the raw `{"metric":...}` bench output (any leading log
prefix is stripped)."""
import json
import sys


def load(path):
    line = open(path).read()
    return json.loads(line[line.index("{"):])

base = load(sys.argv[1])["queries"]
scaled = load(sys.argv[2])["queries"]
threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 12.0

rows = []
for q in sorted(base):
    if q in scaled and base[q] > 0 and scaled[q] > 0:
        rows.append((scaled[q] / base[q], q, base[q], scaled[q]))
rows.sort(reverse=True)

flagged = 0
for ratio, q, b, s in rows:
    mark = " <-- ABOVE THRESHOLD" if ratio > threshold else ""
    if mark:
        flagged += 1
    print(f"{q:34s} {b:8.2f}s -> {s:8.2f}s  {ratio:6.2f}x{mark}")
print(f"\n{len(rows)} queries compared, {flagged} above {threshold}x; "
      f"totals {sum(r[2] for r in rows):.1f}s -> {sum(r[3] for r in rows):.1f}s")
