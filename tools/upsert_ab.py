#!/usr/bin/env python3
"""q_merge_upsert decade decomposition (r15; VERDICT r14 item 2): the key
measured 12.9x/decade at its best config — above-linear, but undecomposed.
This A/B runs the sf10/sf100 pair once with the forced-hash consumer
(SPARK_GRAFT_QTIME_AGG=hash: full plan, including the final global sort
and xxhash64 over every output column) and once with the count consumer
(count(*): ColumnPruning drops the price arithmetic and EliminateSorts
drops the output ORDER BY, leaving the full-outer MERGE itself — the
aggregate + join are cardinality-bearing and cannot be pruned).

  - count arm  = the merge kernel: lineitem aggregate + full-outer join.
  - hash-count delta = the output surface: global sort of the merged rows
    + per-row hashing — O(n log n) + O(n) by construction.

If the COUNT arm is super-linear per decade, the merge itself needs the
bucketed/co-located layout fix; if it is ~linear, SCALING.md gets the
attribution row (output surface, not the merge, carries the excess).

Fresh 64g JVM per run, back-to-back on the same host (the only
comparable discipline — see SCALING.md methodology).

Usage: python3 tools/upsert_ab.py [sf10Dir] [sf100Dir] [jsonOut]
                                  [sf10Parts] [sf100Parts]
       (defaults: testdata_sf10, testdata_sf100, BENCH_upsertAB.json,
        128, 512 — each scale's best measured manual setting)
"""
import json
import os
import re
import subprocess
import sys
import time

KEY = "q_merge_upsert"


def run(repo, sf_dir, init_parts, consumer):
    flag = ("-Dspark.sql.adaptive.coalescePartitions"
            f".initialPartitionNum={init_parts}")
    # The third arm exists because the plain count arm measured SLOWER
    # than the full hash plan at sf100 (105.7 vs 81.0 s): pruning every
    # column leaves ~8-byte join rows, AQE's 64 MB advisory target then
    # coalesces the 512-way exchanges into a handful of multi-10M-row
    # tasks, and the merge runs at a different (worse) geometry than the
    # plan being decomposed. count_fixedgeo pins coalescing OFF so the
    # count plan executes at exactly the hash arm's 512-way geometry —
    # only then is (hash - count) the output surface.
    if consumer == "count_fixedgeo":
        flag += " -Dspark.sql.adaptive.coalescePartitions.enabled=false"
    extra = (os.environ.get("SPARK_EXTRA_JAVA_OPTS", "") + " " + flag).strip()
    env = dict(os.environ, SPARK_GRAFT_QTIME_PASSES="1",
               SPARK_GRAFT_CPUS="32",
               # numeric value also disables the r16 per-query auto default
               SPARK_GRAFT_INIT_PARTITIONS=str(init_parts),
               SPARK_EXTRA_JAVA_OPTS=extra)
    if consumer == "hash":
        env["SPARK_GRAFT_QTIME_AGG"] = "hash"
    else:
        env.pop("SPARK_GRAFT_QTIME_AGG", None)
    t0 = time.time()
    proc = subprocess.run(
        [os.path.join(repo, "tools", "run_class.sh"), "-mem", "64g",
         "graft.QTime", sf_dir, KEY],
        capture_output=True, text=True, env=env, cwd=repo)
    wall = round(time.time() - t0, 1)
    m = re.search(r"\[qtime\] \S+ rows=(\d+) min=([\d.]+)", proc.stdout)
    row = {
        "consumer": consumer,
        "init_parts": init_parts,
        "rows": int(m.group(1)) if m else None,
        "timed_sec": float(m.group(2)) if m else None,
        "jvm_wall_sec": wall,
        "ok": proc.returncode == 0 and m is not None,
    }
    if not row["ok"]:
        row["tail"] = (proc.stdout + proc.stderr)[-300:]
    print(f"[upsert-ab] {consumer}@{sf_dir}: {row['timed_sec']}s "
          f"({row['rows']} rows)", flush=True)
    return row


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf10 = sys.argv[1] if len(sys.argv) > 1 else "testdata_sf10"
    sf100 = sys.argv[2] if len(sys.argv) > 2 else "testdata_sf100"
    out = sys.argv[3] if len(sys.argv) > 3 else "BENCH_upsertAB.json"
    p10 = int(sys.argv[4]) if len(sys.argv) > 4 else 128
    p100 = int(sys.argv[5]) if len(sys.argv) > 5 else 512
    arms = ("count", "count_fixedgeo", "hash")
    rows = {
        "sf10": {c: run(repo, sf10, p10, c) for c in arms},
        "sf100": {c: run(repo, sf100, p100, c) for c in arms},
    }

    def t(sf, c):
        r = rows[sf][c]
        return r["timed_sec"] if r["ok"] else None

    derived = {}
    # `is not None`, not truthiness: a legitimate 0.0 timed_sec (sub-100ms
    # run rounding) must not suppress the derived block (ADVICE r15)
    if all(t(sf, c) is not None for sf in rows for c in arms):
        derived = {
            # the valid kernel arm: same geometry as the full plan
            "merge_kernel_decade_ratio":
                round(t("sf100", "count_fixedgeo") / t("sf10", "count_fixedgeo"), 2),
            "full_plan_decade_ratio":
                round(t("sf100", "hash") / t("sf10", "hash"), 2),
            # the naive count arm, kept to document the AQE-geometry trap
            "count_coalesced_decade_ratio":
                round(t("sf100", "count") / t("sf10", "count"), 2),
            "output_surface_sec": {
                "sf10": round(t("sf10", "hash") - t("sf10", "count_fixedgeo"), 2),
                "sf100": round(t("sf100", "hash") - t("sf100", "count_fixedgeo"), 2),
            },
        }
        d10 = derived["output_surface_sec"]["sf10"]
        d100 = derived["output_surface_sec"]["sf100"]
        if d10 and d10 > 0:
            derived["output_surface_decade_ratio"] = round(d100 / d10, 2)
    artifact = {
        "metric": "q_merge_upsert decade decomposition: merge kernel "
                  "(count consumer; sort+output pruned) vs full plan "
                  "(hash consumer; sort + per-row output hash)",
        "corpora": {"sf10": sf10, "sf100": sf100},
        "method": "graft.QTime warm+1 timed pass, fresh 64g JVM per run, "
                  "32 threads, back-to-back on one host; AQE "
                  f"initialPartitionNum {p10} @ sf10 / {p100} @ sf100 "
                  "(each scale's best measured manual setting)",
        "results": rows,
        "derived": derived,
    }
    with open(os.path.join(repo, out), "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    ok = all(r["ok"] for sf in rows.values() for r in sf.values())
    print(f"[upsert-ab] ok={ok} derived={derived} -> {out}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
