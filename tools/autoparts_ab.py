#!/usr/bin/env python3
"""AutoParts A/B (r15; VERDICT r14 item 4): is the per-query AUTOMATIC
AQE seed (SPARK_GRAFT_INIT_PARTITIONS=auto -> graft.AutoParts, derived
from the plan's reliable size estimates) within noise of the per-key BEST
manual setting found by the r14 sweeps?

Keys = the judge's named set: the spill-bound trio (q_sim_knn_graph 512,
q_tpch_q21 512, q_win_rolling_median 512 — BENCH_sf100_spillAB.json /
BENCH_sf100_rel_p512.json) and the fit-bound key (q_dedup_embed_lsh 256).
Each key runs twice back-to-back in fresh 64g JVMs — manual best, then
auto — so the pair is same-host comparable (the only valid comparison;
SCALING.md methodology).

Usage: python3 tools/autoparts_ab.py [sf100Dir] [jsonOut] [keys]
       (defaults: testdata_sf100, BENCH_autoparts_AB.json, all KEYS)
"""
import json
import os
import re
import subprocess
import sys
import time

# key -> best manual sf100 initialPartitionNum (r14 artifacts)
KEYS = {
    "q_sim_knn_graph": 512,
    "q_tpch_q21": 512,
    "q_win_rolling_median": 512,
    "q_dedup_embed_lsh": 256,
    # r16 extension (VERDICT r15 item 4): the remaining spill-sensitive
    # keys. No per-key sweep exists for these — the manual arm pins the
    # DOCUMENTED sf100 lever (256, the setting every sf100 gate/bench
    # used), except merge_upsert whose measured best is 512
    # (BENCH_upsertAB.json fixed-geometry arm).
    "q_merge_upsert": 512,
    "q_win_cumsum": 256,
    "q_ts_theilsen": 256,
    "q_dedup_substring": 256,
    "q_text_perplexity": 256,
}


def run(repo, sf_dir, key, mode, manual_parts):
    env = dict(os.environ, SPARK_GRAFT_QTIME_PASSES="1",
               SPARK_GRAFT_CPUS="32", SPARK_GRAFT_QTIME_AGG="hash")
    if mode == "manual":
        flag = ("-Dspark.sql.adaptive.coalescePartitions"
                f".initialPartitionNum={manual_parts}")
        env["SPARK_EXTRA_JAVA_OPTS"] = (
            env.get("SPARK_EXTRA_JAVA_OPTS", "") + " " + flag).strip()
        # numeric env value DISABLES the r16 per-query auto default (and
        # pins the builder seed itself — the -D flag is kept for tools
        # replaying this against pre-r16 classes)
        env["SPARK_GRAFT_INIT_PARTITIONS"] = str(manual_parts)
    else:
        env["SPARK_GRAFT_INIT_PARTITIONS"] = "auto"
    t0 = time.time()
    proc = subprocess.run(
        [os.path.join(repo, "tools", "run_class.sh"), "-mem", "64g",
         "graft.QTime", sf_dir, key],
        capture_output=True, text=True, env=env, cwd=repo)
    wall = round(time.time() - t0, 1)
    m = re.search(r"\[qtime\] \S+ rows=(\d+) min=([\d.]+)", proc.stdout)
    a = re.search(r"auto_init_partitions=(\d+)", proc.stdout)
    row = {
        "mode": mode,
        "init_parts": int(a.group(1)) if a else manual_parts,
        "rows": int(m.group(1)) if m else None,
        "timed_sec": float(m.group(2)) if m else None,
        "jvm_wall_sec": wall,
        "ok": proc.returncode == 0 and m is not None,
    }
    if not row["ok"]:
        row["tail"] = (proc.stdout + proc.stderr)[-300:]
    print(f"[auto-ab] {key} {mode} (parts={row['init_parts']}): "
          f"{row['timed_sec']}s ({row['rows']} rows)", flush=True)
    return row


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "testdata_sf100"
    out = sys.argv[2] if len(sys.argv) > 2 else "BENCH_autoparts_AB.json"
    keys = sys.argv[3].split(",") if len(sys.argv) > 3 else list(KEYS)
    unknown = [k for k in keys if k not in KEYS]
    if unknown:
        print(f"[auto-ab] unknown keys (not in KEYS): {unknown}")
        return 2
    out_path = os.path.join(repo, out)
    results = {}
    if len(sys.argv) > 3 and os.path.exists(out_path):
        results = json.load(open(out_path)).get("results", {})
    for key in keys:
        manual = run(repo, sf_dir, key, "manual", KEYS[key])
        auto = run(repo, sf_dir, key, "auto", KEYS[key])
        row = {"manual_best": manual, "auto": auto,
               "run_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
        if manual["ok"] and auto["ok"]:
            row["rows_equal"] = manual["rows"] == auto["rows"]
            row["auto_vs_best"] = round(
                auto["timed_sec"] / manual["timed_sec"], 3)
        results[key] = row
        print(f"[auto-ab] {key}: auto/best = {row.get('auto_vs_best')}",
              flush=True)
    artifact = {
        "metric": "auto (plan-derived) vs best-manual AQE seed partitions "
                  "at sf100; auto_vs_best ~1.0 = the lever is automated",
        "corpus": sf_dir,
        "method": "graft.QTime warm+1 timed pass, forced-hash consumer, "
                  "fresh 64g JVM per run, 32 threads; manual arm pins the "
                  "r14 per-key best via -D flag, auto arm sets "
                  "SPARK_GRAFT_INIT_PARTITIONS=auto (graft.AutoParts "
                  "per-query seed); arms run back-to-back per key",
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    ok = all(r["manual_best"]["ok"] and r["auto"]["ok"]
             for r in results.values())
    print(f"[auto-ab] ok={ok} -> {out}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
