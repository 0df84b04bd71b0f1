#!/bin/bash
# Round-18 final serial tail: full tests -> refreshed sf100 top-k recall
# (adaptive shortlist) -> round-final verify+bench gate.
set -u
cd "$(dirname "$0")/.."
export SPARK_GRAFT_CPUS=32

stage() {
  local name="$1"; shift
  echo "[r18-tail] >>> $name start $(date -u +%H:%M:%SZ)"
  "$@" > "/tmp/r18_t_${name}.log" 2>&1
  echo "[r18-tail] <<< $name rc=$? end $(date -u +%H:%M:%SZ)"
}

stage tests sbt -batch test
stage anntopk2 tools/run_class.sh -mem 64g graft.AnnTopkProbe testdata_sf100 CORRECTNESS_sf100anntopk.json 100
stage verify sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out_r18final"
stage oracle python3 tools/verify_local.py /root/testdata/sf0.01 /tmp/verify_out_r18final
stage smoke sbt -batch "runMain graft.Smoke"
stage bench env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_HASH_BENCH_OUT=BENCH_hash_r18.json \
  sbt -batch "runMain graft.Bench"
echo "[r18-tail] ALL DONE $(date -u +%H:%M:%SZ)"
