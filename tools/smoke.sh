#!/usr/bin/env bash
# Builder-loop pre-commit smoke gate (VERDICT r6 task 8): catches an
# environment shift (Spark upgrade, regenerated testdata annotation)
# the day it happens instead of at round end. Runs the full registry at
# smoke scale and the DuckDB compare; graft.Verify exits non-zero on
# any failed key, check.py on any hash mismatch.
#
# Usage: tools/smoke.sh [sfDir]   (default /root/testdata/sf0.001)
#
# Evidence trail (VERDICT r7 task 6): every run — pass or fail —
# appends one line to tools/smoke.log (committed with the work it
# gated), so round artifacts show the gate actually ran per session.
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.001}"
OUT="$(mktemp -d /tmp/graft_smoke_XXXX)"
record() { # $1 = verdict
  printf '%s sha=%s sf=%s keys=%s %s\n' \
    "$(date -u +%Y-%m-%dT%H:%M:%SZ)" \
    "$(git rev-parse --short HEAD 2>/dev/null || echo none)" \
    "$(basename "$SF")" \
    "$(find "$OUT" -mindepth 1 -maxdepth 1 -type d | wc -l | tr -d ' ')" \
    "$1" >> tools/smoke.log
}
echo "[smoke] Verify @ $SF -> $OUT"
sbt -batch "runMain graft.Verify $SF $OUT" >"$OUT/verify.log" 2>&1 || {
  echo "[smoke] VERIFY FAILED — see $OUT/verify.log"
  grep "\[verify\]" "$OUT/verify.log" || true
  record VERIFY_FAILED
  exit 1
}
echo "[smoke] DuckDB compare"
python3 tools/check.py "$SF" "$OUT" || { record COMPARE_FAILED; exit 1; }
record green
echo "[smoke] green"
