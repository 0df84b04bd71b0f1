#!/usr/bin/env python3
"""Relational third decade (r14; closes VERDICT r13 item 5): the TPC-H /
window / merge plans were measured through sf10 (60 M lineitem rows); the
partition-sizing lever extrapolated one decade untested. This probe
ScaleGen-extends the relational tables to 1000x (600 M lineitem / 150 M
orders / 100 M events, disjoint key spaces per replica) and measures the
six sf10-gate TPC-H shapes + q_merge_upsert + the window family at BOTH
sf10 and sf100 in fresh 64g JVMs on the same host, so the per-decade
ratios are like-for-like (the committed BENCH_sf10.json is a different
host-day and covers only a 26-key subset).

Lever discipline: sf10 runs pin AQE initialPartitionNum=128 (the
documented sf10 setting), sf100 runs pin 256 (the lever scaled one decade
with the data, same rule the docs-side sf100 gate uses).

Consumer discipline: every run sets SPARK_GRAFT_QTIME_AGG=hash. The
default count() consumer lets ColumnPruning delete any computed column
the count does not reference — for the window family that removes the
Window operators AND their sorts, so count-based numbers time the parquet
scan (measured: 100 M windowed rows "in" 0.8 s). The hash consumer
aggregates xxhash64 over every output column, forcing the full plan.

Usage: python3 tools/sf100_rel_bench.py [sf10Dir] [sf100Dir] [jsonOut] [keys]
                                        [sf100Parts]
       (defaults: testdata_sf10, testdata_sf100, BENCH_sf100_rel.json,
        all KEYS, 256; a comma-separated 4th arg re-measures just those
        keys and merges them into an existing jsonOut — each key's pair of
        fresh-JVM runs is independent, so partial refresh is sound. The
        5th arg overrides the sf100 initialPartitionNum — the lever
        follow-up for keys the 256 sweep measured super-linear.)
"""
import json
import os
import re
import subprocess
import sys
import time

KEYS = [
    "q_tpch_q1", "q_tpch_q3", "q_tpch_q6", "q_tpch_q9", "q_tpch_q18",
    "q_tpch_q21",
    "q_merge_upsert",
    "q_win_rank", "q_win_lag_delta", "q_win_rolling_avg", "q_win_range_time",
    "q_win_ntile", "q_win_cumsum", "q_win_rolling_corr",
    "q_win_rolling_median", "q_win_pattern", "q_win_streak",
]


def run_key(repo, key, sf_dir, init_parts):
    flag = ("-Dspark.sql.adaptive.coalescePartitions"
            f".initialPartitionNum={init_parts}")
    extra = (os.environ.get("SPARK_EXTRA_JAVA_OPTS", "") + " " + flag).strip()
    env = dict(os.environ, SPARK_GRAFT_QTIME_PASSES="1",
               SPARK_GRAFT_CPUS="32", SPARK_GRAFT_QTIME_AGG="hash",
               # numeric value also disables the r16 per-query auto default
               SPARK_GRAFT_INIT_PARTITIONS=str(init_parts),
               SPARK_EXTRA_JAVA_OPTS=extra)
    t0 = time.time()
    proc = subprocess.run(
        [os.path.join(repo, "tools", "run_class.sh"), "-mem", "64g",
         "graft.QTime", sf_dir, key],
        capture_output=True, text=True, env=env, cwd=repo)
    wall = round(time.time() - t0, 1)
    m = re.search(r"\[qtime\] \S+ rows=(\d+) min=([\d.]+)", proc.stdout)
    row = {
        "rows": int(m.group(1)) if m else None,
        "timed_sec": float(m.group(2)) if m else None,
        "jvm_wall_sec": wall,
        # per-row record of the partition lever (ADVICE r14): a partial-key
        # re-run with a different 5th arg merged into an existing artifact
        # must stay attributable row-by-row, not only via the top-level
        # method string (which describes the LAST run's setting)
        "init_parts": init_parts,
        "ok": proc.returncode == 0 and m is not None,
    }
    if not row["ok"]:
        row["tail"] = (proc.stdout + proc.stderr)[-300:]
    return row


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf10 = sys.argv[1] if len(sys.argv) > 1 else "testdata_sf10"
    sf100 = sys.argv[2] if len(sys.argv) > 2 else "testdata_sf100"
    out = sys.argv[3] if len(sys.argv) > 3 else "BENCH_sf100_rel.json"
    keys = sys.argv[4].split(",") if len(sys.argv) > 4 else KEYS
    sf100_parts = int(sys.argv[5]) if len(sys.argv) > 5 else 256
    unknown = [k for k in keys if k not in KEYS]
    if unknown:
        # a typo'd key would otherwise create a bogus row in the artifact
        print(f"[rel-bench] unknown keys (not in KEYS): {unknown}")
        return 2
    results = {}
    out_path = os.path.join(repo, out)
    if len(sys.argv) > 4 and os.path.exists(out_path):
        results = json.load(open(out_path)).get("results", {})
        # Refuse a silent mixed-config merge (ADVICE r14): if the existing
        # artifact's sf100 rows were measured at a different
        # initialPartitionNum, merging rows at this run's setting would
        # make the artifact internally inconsistent with its own method
        # string. Rows from tools predating init_parts tracking are
        # grandfathered at 256 (the only setting ever used before it).
        mixed = {
            k: v["sf100"].get("init_parts", 256)
            for k, v in results.items()
            if k not in keys and v["sf100"].get("init_parts", 256) != sf100_parts
        }
        if mixed:
            print(f"[rel-bench] REFUSING merge: existing rows measured at "
                  f"sf100 init_parts {sorted(set(mixed.values()))}, this run "
                  f"uses {sf100_parts} — write to a separate jsonOut "
                  f"(e.g. the _p{sf100_parts} convention) instead")
            return 2
    for key in keys:
        r10 = run_key(repo, key, sf10, 128)
        r100 = run_key(repo, key, sf100, sf100_parts)
        ratio = (round(r100["timed_sec"] / r10["timed_sec"], 2)
                 if r10["ok"] and r100["ok"] and r10["timed_sec"] else None)
        results[key] = {"sf10": r10, "sf100": r100, "decade_ratio": ratio}
        print(f"[rel-bench] {key}: sf10 {r10['timed_sec']}s "
              f"({r10['rows']} rows) -> sf100 {r100['timed_sec']}s "
              f"({r100['rows']} rows), ratio {ratio}", flush=True)
    artifact = {
        "metric": "relational third decade: sf10 -> sf100 per-key ratios "
                  "(10x rows per decade; linear = 10)",
        "corpora": {"sf10": sf10, "sf100": sf100},
        "method": "graft.QTime warm+1 timed pass, fresh 64g JVM per run, "
                  "32 threads; AQE initialPartitionNum 128 @ sf10 / "
                  f"{sf100_parts} @ sf100 (the documented partition-sizing "
                  "lever); forced-hash consumer "
                  "(SPARK_GRAFT_QTIME_AGG=hash) so window columns cannot "
                  "be pruned by the count",
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    ok = all(v["sf10"]["ok"] and v["sf100"]["ok"] for v in results.values())
    print(f"[rel-bench] ok={ok} -> {out}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
