#!/bin/bash
# r16-vs-r17 hash-series A/B (r18; VERDICT r17 item 5): run the r16 binary
# (e0ca57d) and the r17 round-final binary (b8e04e6) through the SAME
# hash-series bench back-to-back on a quiet host — the repo's own
# comparability standard (SCALING.md:4-8) — to attribute the recorded
# 96.7 -> 103.7 s twin movement to host or to code. Order r16, r17, r16
# again: the repeat bounds within-window host drift so a code effect can't
# hide behind it. Count arm runs 1 pass (its number is NOT the series
# metric here); hash series keeps the recorded method (2 passes, min).
set -x
cd /root/repo
for d in .ab/r16 .ab/r17; do
  (cd $d && sbt -batch compile) || exit 1
done
run() { # run <worktree> <tag>
  (cd $1 && \
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_BENCH_PASSES=1 \
    SPARK_GRAFT_HASH_BENCH_OUT=/root/repo/BENCH_hash_ab_$2.json \
    sbt -batch "runMain graft.Bench")
}
run .ab/r16 r16a
run .ab/r17 r17
run .ab/r16 r16b
echo "=== AB DONE ==="
