#!/usr/bin/env bash
# Builder-loop pre-commit smoke gate (VERDICT r6 task 8): catches an
# environment shift (Spark upgrade, regenerated testdata annotation)
# the day it happens instead of at round end. Runs the full registry at
# smoke scale and the DuckDB compare; graft.Verify exits non-zero on
# any failed key, check.py on any hash mismatch.
#
# Usage: tools/smoke.sh [sfDir]   (default /root/testdata/sf0.001)
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.001}"
OUT="$(mktemp -d /tmp/graft_smoke_XXXX)"
echo "[smoke] Verify @ $SF -> $OUT"
sbt -batch "runMain graft.Verify $SF $OUT" >"$OUT/verify.log" 2>&1 || {
  echo "[smoke] VERIFY FAILED — see $OUT/verify.log"
  grep "\[verify\]" "$OUT/verify.log" || true
  exit 1
}
echo "[smoke] DuckDB compare"
python3 tools/check.py "$SF" "$OUT"
echo "[smoke] green"
