#!/usr/bin/env bash
# The ONLY allowed commit path (CLAUDE.md gate; added after the r13
# end-of-round snapshot committed 57 uncompiled lines 3 minutes after the
# gates had run — VERDICT r13 "what's wrong" #2). Usage:
#
#   tools/gate.sh            # compile + Verify/check.py at sf0.01, then commit:
#   tools/gate.sh -m "msg"   # ...gate, then `git commit -am "msg"` on success
#   FULL=1 tools/gate.sh     # additionally run the whole ScalaTest suite
#   SF=/root/testdata/sf0.1 tools/gate.sh   # gate on a different fixture
#
# Exit code is non-zero on ANY gate failure; the commit (if requested)
# only happens after every gate passed in THIS invocation — there is no
# way to commit through this script with a red gate.
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${SF:-/root/testdata/sf0.01}"
OUT="${OUT:-/tmp/gate_verify_out}"
MSG=""
if [[ "${1:-}" == "-m" ]]; then MSG="${2:?-m needs a message}"; fi

echo "[gate] 1/3 sbt compile + Test/compile"
sbt -batch compile Test/compile

if [[ "${FULL:-0}" == "1" ]]; then
  echo "[gate] 1b/3 sbt test (FULL=1)"
  sbt -batch test
fi

echo "[gate] 2/3 graft.Verify $SF -> $OUT"
rm -rf "$OUT"
sbt -batch "runMain graft.Verify $SF $OUT"

echo "[gate] 3/3 tools/check.py"
python3 tools/check.py "$OUT" "$SF" | tee /tmp/gate_check.log
grep -q " 0 fail" /tmp/gate_check.log || {
  echo "[gate] FAIL: check.py reported failures"; exit 1; }
# "0 ok, 0 fail" must NOT pass: an empty oracle dump is exactly the r13
# incident shape (CORRECTNESS_r13.json = {}). Ratchet (VERDICT r14 #3):
# ok count must equal the oracle count Verify just dumped, and the oracle
# count must be exactly declared-minus-6 (the 6 rows-only-by-contract
# queries, SURVEY §2B/§6) where declared = the parquet dirs Verify wrote —
# a regression that silently DROPPED oracles can no longer clear a floor.
N_OK=$(sed -n 's/^== \([0-9]*\) ok.*/\1/p' /tmp/gate_check.log | tail -1)
N_ORACLE=$(python3 -c "import json;print(len(json.load(open('$OUT/oracle_sql.json'))))")
N_DECLARED=$(find "$OUT" -mindepth 1 -maxdepth 1 -type d | wc -l)
[ "${N_OK:-0}" -eq "$N_ORACLE" ] || {
  echo "[gate] FAIL: $N_OK ok != $N_ORACLE oracle-checkable queries"; exit 1; }
[ "$N_ORACLE" -eq "$((N_DECLARED - 6))" ] || {
  echo "[gate] FAIL: $N_ORACLE oracles != $N_DECLARED declared - 6"; exit 1; }
[ "$N_DECLARED" -ge 284 ] || {
  echo "[gate] FAIL: only $N_DECLARED declared queries (frozen inventory is 284)"; exit 1; }

echo "[gate] ALL GREEN"
if [[ -n "$MSG" ]]; then
  git add -A
  git commit -m "$MSG" -m "Gate: tools/gate.sh green (compile + Verify/check.py @ $(basename "$SF")${FULL:+ + full suite})"
fi
