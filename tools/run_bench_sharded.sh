#!/bin/bash
# Family-sharded full-registry bench: one JVM per key family instead of
# one 30+-minute JVM for all ~178 keys. Cuts hot-box exposure per
# session (the round-9 drift lesson: long single-JVM suites accumulate
# load skew) while keeping the artifact schema identical —
# tools/merge_bench_shards.py folds the per-shard records into one
# bench_full JSON with summed total and per-shard load evidence.
#
# Usage: tools/run_bench_sharded.sh OUT.json [SF_DIR]
set -e
cd "$(dirname "$0")/.."
OUT="${1:?usage: run_bench_sharded.sh OUT.json [SF_DIR]}"
SF="${2:-/root/testdata/sf0.1}"
SHARD_DIR=$(mktemp -d /tmp/bench_shards_XXXX)

# family = first letter of the key prefix (q/d/s/t/e/p/m/x).
# sbt tags app stdout as "[info] " — match the marker anywhere.
KEYS=$(sbt -batch "runMain graft.ListKeys" 2>/dev/null \
  | grep -o 'key: [a-z0-9_]*' | cut -d' ' -f2)
if [ -z "$KEYS" ]; then
  # fallback: derive the registry from the last full record
  KEYS=$(python3 -c "
import json
print('\n'.join(sorted(json.load(open('bench_full_latest.json'))['queries'])))")
fi

for fam in q d s t e p m x; do
  only=$(echo "$KEYS" | grep "^$fam" | paste -sd, -)
  [ -z "$only" ] && continue
  echo "=== shard $fam ($(echo "$only" | tr ',' '\n' | wc -l) keys) ==="
  SPARK_GRAFT_SF_DIR="$SF" \
  SPARK_GRAFT_BENCH_ONLY="$only" \
  SPARK_GRAFT_BENCH_FULL_OUT="$SHARD_DIR/$fam.json" \
  SPARK_GRAFT_BENCH_PRODUCER="${SPARK_GRAFT_BENCH_PRODUCER:-builder}" \
  sbt -batch "runMain graft.Bench" > "$SHARD_DIR/$fam.log" 2>&1 \
    || echo "shard $fam exited nonzero (see $SHARD_DIR/$fam.log)"
done

python3 tools/merge_bench_shards.py "$OUT" "$SHARD_DIR"/*.json
echo "merged -> $OUT (shard logs in $SHARD_DIR)"
