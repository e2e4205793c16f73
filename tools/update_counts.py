#!/usr/bin/env python3
"""Regenerate the test/query counts in README.md from the real gates,
so the numbers can never drift from `sbt test` output again (the class
of staleness VERDICT r7/r8 flagged twice).

Sources of truth:
  - test count: `sbt -batch test` stdout ("Tests: succeeded N, failed 0")
    — or pass --tests N to reuse a run from this session;
  - query count: the oracle_sql.json a `graft.Verify` run dumps
    (default /tmp/verify_out) — every declared query has an oracle
    entry, so its key count IS the query inventory.

Usage: python3 tools/update_counts.py [--tests N] [--verify-dir DIR]
"""
import argparse
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ap = argparse.ArgumentParser()
ap.add_argument("--tests", type=int, default=None,
                help="test count from an sbt test run this session")
ap.add_argument("--verify-dir", default="/tmp/verify_out",
                help="output dir of a graft.Verify run (for oracle_sql.json)")
args = ap.parse_args()

tests = args.tests
if tests is None:
    print("[counts] running sbt -batch test ...", file=sys.stderr)
    out = subprocess.run(["sbt", "-batch", "test"], cwd=ROOT,
                         capture_output=True, text=True).stdout
    m = re.search(r"Tests: succeeded (\d+), failed (\d+)", out)
    if not m:
        sys.exit("[counts] could not parse sbt test output")
    if m.group(2) != "0":
        sys.exit(f"[counts] refusing to update counts from a RED suite "
                 f"({m.group(2)} failures)")
    tests = int(m.group(1))

oracle = os.path.join(args.verify_dir, "oracle_sql.json")
with open(oracle) as f:
    names = sorted(json.load(f))
queries = len(names)

# Derive the id span from the REAL keys, naming any gaps — a synthetic
# "contiguous q01-qN" claim drifts the moment an id is retired (the
# q102 lesson, flagged by two audits).
ids = sorted(int(re.match(r"q(\d+)", n).group(1)) for n in names)
gaps = sorted(set(range(ids[0], ids[-1] + 1)) - set(ids))
span = f"q{ids[0]:02d}-q{ids[-1]}"
span += f", {', '.join(f'q{g}' for g in gaps)} unused" if gaps else ", contiguous"

readme = os.path.join(ROOT, "README.md")
text = open(readme).read()
subs = [
    (r"# \d+ unit/property/plan tests", f"# {tests} unit/property/plan tests"),
    (r"- \d+ unit/property/plan tests", f"- {tests} unit/property/plan tests"),
    (r"- \d+ driver queries \((?:a contiguous )?q01-q\d+[^)]*\)",
     f"- {queries} driver queries ({span})"),
    (r"\*\*all \d+ hash-verified", f"**all {queries} hash-verified"),
    (r"all \d+ queries at", f"all {queries} queries at"),
]
changed = 0
for pat, rep in subs:
    text, n = re.subn(pat, rep, text)
    changed += n
open(readme, "w").write(text)
print(f"[counts] tests={tests} queries={queries}; "
      f"{changed} README patterns rewritten")
