#!/usr/bin/env python3
"""Cross-artifact invariant check (the gate the round judges run by hand):

  SparkEntry.queries keys  ==  SURVEY.md §2 cited keys
  SparkEntry.oracleSql keys ⊆ queries keys
  every oracle-backed key has a BASELINE.md row
  (optional) CORRECTNESS_r*.json keys == queries keys

Exit 0 iff every invariant holds. Run from the repo root.
"""
import json
import pathlib
import re
import sys

root = pathlib.Path(__file__).resolve().parent.parent
entry = (root / "src/main/scala/graft/SparkEntry.scala").read_text()

# queries map: between `def queries` and `def oracleSql`
qstart = entry.index("def queries")
ostart = entry.index("def oracleSql")
queries = set(re.findall(r'"(q_[a-z0-9_]+)" ->', entry[qstart:ostart]))
oracles = set(re.findall(r'"(q_[a-z0-9_]+)" ->', entry[ostart:]))

survey = (root / "SURVEY.md").read_text()
cited = set()
key_cell = re.compile(r"^(`q_[a-z0-9_]+`(\s*,\s*)?)+(\s*\(.*\))?$")
for line in survey.splitlines():
    if line.startswith("| ") and "`q_" in line:
        # the key cell is the one consisting ONLY of backticked keys —
        # descriptions may contain literal pipes, so positions shift
        for cell in line.split("|"):
            c = cell.strip()
            if key_cell.match(c):
                cited |= set(re.findall(r"`(q_[a-z0-9_]+)`", c))

baseline = (root / "BASELINE.md").read_text()
base_keys = set(re.findall(r"^\|?\s*`?(q_[a-z0-9_]+)`?\s*†?\s*\|", baseline, re.M))

ok = True


def diff(name, a, b, la, lb):
    global ok
    if a - b:
        ok = False
        print(f"FAIL {name}: in {la} but not {lb}: {sorted(a - b)}")
    if b - a:
        ok = False
        print(f"FAIL {name}: in {lb} but not {la}: {sorted(b - a)}")


diff("queries<->survey", queries, cited, "SparkEntry.queries", "SURVEY §2 citations")
if oracles - queries:
    ok = False
    print(f"FAIL oracles without a queries entry: {sorted(oracles - queries)}")
missing_baseline = oracles - base_keys
if missing_baseline:
    ok = False
    print(f"FAIL oracle-backed keys without a BASELINE.md row: {sorted(missing_baseline)}")

corr = sorted(root.glob("CORRECTNESS_r*.json"))
if corr:
    latest = corr[-1]
    try:
        keys = set(json.loads(latest.read_text()).keys())
        extra, miss = keys - queries, queries - keys
        if miss:
            print(f"note: {latest.name} lacks {len(miss)} newer keys (expected mid-round): {sorted(miss)[:8]}…")
        if extra:
            ok = False
            print(f"FAIL {latest.name} has keys no longer in queries: {sorted(extra)}")
    except Exception as e:  # pragma: no cover - diagnostic only
        print(f"note: could not parse {latest.name}: {e}")

print(f"queries={len(queries)} oracles={len(oracles)} rows_only={len(queries - oracles)} "
      f"survey_cited={len(cited)} baseline_rows={len(base_keys & oracles)}")
print("OK" if ok else "INVARIANTS BROKEN")
sys.exit(0 if ok else 1)
