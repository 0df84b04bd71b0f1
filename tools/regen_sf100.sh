#!/bin/bash
# Regenerate the sf100 probe corpus (r13; VERDICT r12 item 7): documents +
# embeddings ONLY (5M docs / 2M vectors, ~3 GB) — 1000x the full 10-table
# set would be ~16 GB of lineitem nobody probes. The output directory is
# gitignored; this script is the committed, reproducible recipe.
#
#   tools/regen_sf100.sh [dstDir]          # default testdata_sf100
#
# The smaller ScaleGen tiers (same base, same replica content — the
# subcorpus-superset recall witness depends on that containment):
#   tools/run_class.sh graft.ScaleGen /root/testdata/sf0.1 testdata_sf1  10
#   tools/run_class.sh graft.ScaleGen /root/testdata/sf0.1 testdata_sf10 100
set -euo pipefail
cd "$(dirname "$0")/.."
DST="${1:-testdata_sf100}"
exec tools/run_class.sh -mem 32g graft.ScaleGen \
  /root/testdata/sf0.1 "$DST" 1000 --tables documents,embeddings
