#!/bin/bash
# Round-18 serial verify gate (one script so measured stages never overlap
# with compiles or each other). Log: /tmp/r18_gate1.log
set -x
cd /root/repo
echo "=== STAGE compile ==="
sbt -batch compile || exit 1
echo "=== STAGE verify sf0.01 ==="
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out_r18a"
echo "=== STAGE oracle sf0.01 ==="
python3 tools/verify_local.py /root/testdata/sf0.01 /tmp/verify_out_r18a
echo "=== STAGE smoke ==="
sbt -batch "runMain graft.Smoke"
echo "=== STAGE bench sf0.1 ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_HASH_BENCH_OUT=BENCH_hash_r18a.json \
  sbt -batch "runMain graft.Bench"
echo "=== GATE DONE ==="
