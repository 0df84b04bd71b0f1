#!/usr/bin/env python3
"""Committed sf100 spill A/B (r14; closes VERDICT r12 item 8 / r13 item 3):
measure the two spill-heaviest sf100 keys at 256 vs 512 AQE initial
partitions, fresh 64g JVM per run, one timed pass (the spill-disk
discipline), and write the numbers as an artifact — the lever
(SPARK_EXTRA_JAVA_OPTS passthrough in run_class.sh) landed in r13 but its
measured rows were never committed.

Usage: python3 tools/sf100_spill_ab.py [sf100Dir] [jsonOut]
       (defaults: testdata_sf100, BENCH_sf100_spillAB.json)
"""
import json
import os
import re
import subprocess
import sys
import time

KEYS = ["q_dedup_embed_lsh", "q_sim_knn_graph"]
PARTS = [256, 512]


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "testdata_sf100"
    out = sys.argv[2] if len(sys.argv) > 2 else "BENCH_sf100_spillAB.json"
    results = {}
    for key in KEYS:
        results[key] = {}
        for p in PARTS:
            flag = ("-Dspark.sql.adaptive.coalescePartitions"
                    f".initialPartitionNum={p}")
            extra = (os.environ.get("SPARK_EXTRA_JAVA_OPTS", "")
                     + " " + flag).strip()
            env = dict(os.environ, SPARK_GRAFT_QTIME_PASSES="1",
                       SPARK_GRAFT_CPUS="32",
                       # numeric: disables the r16 per-query auto default
                       SPARK_GRAFT_INIT_PARTITIONS=str(p),
                       SPARK_EXTRA_JAVA_OPTS=extra)
            t0 = time.time()
            proc = subprocess.run(
                [os.path.join(repo, "tools", "run_class.sh"), "-mem", "64g",
                 "graft.QTime", sf_dir, key],
                capture_output=True, text=True, env=env, cwd=repo)
            wall = round(time.time() - t0, 1)
            m = re.search(
                r"\[qtime\] \S+ rows=(\d+) min=([\d.]+)", proc.stdout)
            row = {
                "init_partitions": p,
                "rows": int(m.group(1)) if m else None,
                "timed_sec": float(m.group(2)) if m else None,
                "jvm_wall_sec": wall,
                "ok": proc.returncode == 0 and m is not None,
            }
            if not row["ok"]:
                row["tail"] = (proc.stdout + proc.stderr)[-300:]
            results[key][str(p)] = row
            print(f"[spill-ab] {key} @{p}: "
                  f"{row['timed_sec']}s (rows={row['rows']}, jvm {wall}s)",
                  flush=True)
    artifact = {
        "metric": "sf100 spill A/B: AQE initial partitions 256 vs 512",
        "corpus": sf_dir,
        "method": "graft.QTime warm+1 timed pass, fresh 64g JVM per run, "
                  "SPARK_GRAFT_QTIME_PASSES=1 (spill freed between passes); "
                  "identical rows across configs is the correctness "
                  "invariant",
        "results": results,
    }
    with open(os.path.join(repo, out), "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    ok = all(r["ok"] for k in results.values() for r in k.values())
    same_rows = all(
        len({r["rows"] for r in k.values()}) == 1 for k in results.values())
    print(f"[spill-ab] ok={ok} identical_rows={same_rows} -> {out}")
    return 0 if ok and same_rows else 1


if __name__ == "__main__":
    sys.exit(main())
