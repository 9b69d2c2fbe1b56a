#!/bin/bash
# Round-9 full-registry sf0.1 bench -> bench_full_r9a.json
cd /root/repo
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_FULL_OUT=/root/repo/bench_full_r9a.json \
SPARK_GRAFT_BENCH_PRODUCER=builder \
sbt -batch "runMain graft.Bench" > /tmp/bench_r9a.log 2>&1
echo "exit=$?" >> /tmp/bench_r9a.log
