#!/bin/bash
# Round-17 serial measured-run queue. One stage at a time, uncontended
# (SCALING.md methodology: never overlap measured JVMs; never run sbt while
# a stage runs). Each stage logs to /tmp/r17_q_<stage>.log; this script's
# own log is the progress index.
set -u
cd "$(dirname "$0")/.."
export SPARK_GRAFT_CPUS=32

stage() {
  local name="$1"; shift
  echo "[r17-queue] >>> $name start $(date -u +%H:%M:%SZ)"
  "$@" > "/tmp/r17_q_${name}.log" 2>&1
  echo "[r17-queue] <<< $name rc=$? end $(date -u +%H:%M:%SZ)"
}

# 1. the headline verdict item: merge_upsert auto-vs-manual refresh
stage autoparts_ab python3 tools/autoparts_ab.py testdata_sf100 BENCH_autoparts_AB.json q_merge_upsert

# 2. interp/gapfill sf100 oracle rows (subset form)
stage ts_gate python3 tools/sf100_ts_gate.py

# 3. ANN planted recall at 2M-vector occupancy
stage ann_recall tools/run_class.sh -mem 64g graft.AnnRecallProbe testdata_sf100 CORRECTNESS_sf100ann.json

# 4. merge-on-read pricing, sf10 first (cheap), then sf100
stage upsertread_sf10 tools/run_class.sh -mem 64g graft.UpsertReadBench testdata_sf10 BENCH_upsertread_sf10.json

# 5. pair-graph third decade (long)
stage graph_gate python3 tools/sf100_graph_gate.py

# 6. streaming third decade (long)
stage streambench tools/run_class.sh -mem 64g graft.StreamBench testdata_sf100 STREAMBENCH_sf100.json

# 7. merge-on-read pricing at sf100
stage upsertread_sf100 tools/run_class.sh -mem 64g graft.UpsertReadBench testdata_sf100 BENCH_upsertread_sf100.json

echo "[r17-queue] ALL DONE $(date -u +%H:%M:%SZ)"
