#!/bin/bash
# Partial oracle check for local iteration: verify_some.sh q_a,q_b [sfDir]
# Runs graft.Verify restricted to the named queries into a scratch dir,
# prunes oracle_sql.json to those queries, then runs the full
# check_correctness comparator on the subset. Exit 0 iff all named
# oracle-backed queries PASS.
set -e
Q="$1"; SF="${2:-/root/testdata/sf0.01}"; OUT=${3:-/tmp/verify_some}
rm -rf "$OUT"
sbt -batch "runMain graft.Verify $SF $OUT $Q" >/tmp/verify_some.log 2>&1 \
  || { echo "Verify failed; tail of log:"; tail -20 /tmp/verify_some.log; exit 1; }
python3 - "$Q" "$OUT" <<'EOF'
import json, sys
qs = set(sys.argv[1].split(','))
p = sys.argv[2] + '/oracle_sql.json'
d = json.load(open(p))
json.dump({k: v for k, v in d.items() if k in qs}, open(p, 'w'))
EOF
python3 tools/check_correctness.py "$SF" "$OUT"
