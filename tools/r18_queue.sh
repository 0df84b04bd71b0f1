#!/bin/bash
# Round-18 serial measured-run queue. One stage at a time, uncontended
# (SCALING.md methodology: never overlap measured JVMs; never run sbt in
# /root/repo while a stage runs). Each stage logs to /tmp/r18_q_<stage>.log.
set -u
cd "$(dirname "$0")/.."
export SPARK_GRAFT_CPUS=32

stage() {
  local name="$1"; shift
  echo "[r18-queue] >>> $name start $(date -u +%H:%M:%SZ)"
  "$@" > "/tmp/r18_q_${name}.log" 2>&1
  echo "[r18-queue] <<< $name rc=$? end $(date -u +%H:%M:%SZ)"
}

# 0. fresh binaries for every stage (worktrees compile inside the A/B script)
stage compile sbt -batch compile

# 1. hash-series drift A/B: r16 binary vs r17 binary, r16 repeated
#    (VERDICT r17 item 5) — first, while the host window is quiet
stage hash_ab bash tools/r18_hash_ab.sh

# 2. ANN top-k recall@10 distribution at sf100 occupancy, query-time-only
#    walls off the stored index (VERDICT r17 items 1+4)
stage anntopk tools/run_class.sh -mem 64g graft.AnnTopkProbe testdata_sf100 CORRECTNESS_sf100anntopk.json 100

# 3. ANN pair recall refresh (storage-rounded planted vectors, ADVICE r17)
stage annrecall tools/run_class.sh -mem 64g graft.AnnRecallProbe testdata_sf100 CORRECTNESS_sf100ann.json

# 4. stateful streaming kernels' third decade (VERDICT r17 item 2)
stage sbench_state env SPARK_GRAFT_STREAMBENCH_ONLY=state_kernels \
  tools/run_class.sh -mem 64g graft.StreamBench testdata_sf100 STREAMBENCH_sf100_state.json

# 5. sf100 oracle gate widening: window/join/moment families (item 3)
stage rel_gate python3 tools/sf100_rel_gate.py testdata_sf100 CORRECTNESS_sf100rel.json q_win_rank,q_win_ntile,q_win_streak,q_win_pattern,q_win_rolling_corr,q_join_range,q_join_asof,q_agg_corr,q_agg_skewness,q_agg_kurtosis,q_agg_mad

# 6. multimodal decade probe: GB-scale payload store (item 6)
stage mediabench tools/run_class.sh -mem 64g graft.MediaBench testdata_sf10 BENCH_media_decade.json 8 2

echo "[r18-queue] ALL DONE $(date -u +%H:%M:%SZ)"
