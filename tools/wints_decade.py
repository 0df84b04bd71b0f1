#!/usr/bin/env python3
"""Plan-true window/TS decade series (r16; VERDICT r15 item 2).

BENCH_sf1.json / BENCH_sf10.json's window and time-series rows are
count-consumer numbers: ColumnPruning deletes the window operators and
aggregate expressions a count() never reads, so those rows measured the
parquet scan — the exact blind spot q_ts_interp_linear's O(n^2) frames
hid in for 14 rounds (17.9 s plan-true vs 0.17 s count at sf0.1). This
re-measures the full window + TS families (every q_win_* / q_ts_* key)
under QTime's forced-hash consumer (xxhash64 over every output column —
nothing prunable) at sf0.1 -> sf1 -> sf10 and derives per-key decade
ratios. ratio ~<= 10 = linear-or-better per decade; a key well above 10
is a scale finding that needs a fix or a named regime.

One fresh 64g JVM per scale (all keys serial inside it — uncontended,
same-host; only back-to-back comparisons are claims). The AQE seed is
SPARK_GRAFT_INIT_PARTITIONS=auto (graft.AutoParts) so each plan gets its
plan-derived geometry at every scale — the same configuration a fleet
run would use.

Usage: python3 tools/wints_decade.py [jsonOut] [keysCsv]
       (defaults: BENCH_wints_decade.json, all q_win_*/q_ts_* keys)
"""
import json
import os
import re
import subprocess
import sys
import time

SCALES = [
    # (label, dir, timed passes) — sf10's heavy keys run 1 timed pass
    # (QTime GCs between passes, but a second pass of every key at sf10
    # doubles a multi-hour run for noise the min-of-2 at sf1 already bounds)
    ("sf0.1", "/root/testdata/sf0.1", "2"),
    ("sf1", "testdata_sf1", "2"),
    ("sf10", "testdata_sf10", "1"),
]


def family_keys(repo):
    """Every q_win_* / q_ts_* registry key, from the oracle manifest the
    repo already dumps (RegistrySpec pins registry<->SURVEY consistency)."""
    src = subprocess.run(
        ["grep", "-rhoE", r'"q_(win|ts)_[a-z0-9_]+"', "src/main/scala/graft/ops"],
        capture_output=True, text=True, cwd=repo).stdout
    return sorted({k.strip('"') for k in src.split()})


def run_scale(repo, sf_dir, keys, passes):
    env = dict(os.environ, SPARK_GRAFT_QTIME_PASSES=passes,
               SPARK_GRAFT_CPUS="32", SPARK_GRAFT_QTIME_AGG="hash",
               SPARK_GRAFT_INIT_PARTITIONS="auto")
    t0 = time.time()
    proc = subprocess.run(
        [os.path.join(repo, "tools", "run_class.sh"), "-mem", "64g",
         "graft.QTime", sf_dir, ",".join(keys)],
        capture_output=True, text=True, env=env, cwd=repo)
    wall = round(time.time() - t0, 1)
    rows = {}
    for m in re.finditer(r"\[qtime\] (\S+) rows=(\d+) min=([\d.]+)",
                         proc.stdout):
        rows[m.group(1)] = {"rows": int(m.group(2)),
                            "timed_sec": float(m.group(3))}
    seeds = dict(re.findall(r"\[qtime\] (\S+) auto_init_partitions=(\d+)",
                            proc.stdout))
    for k, n in seeds.items():
        if k in rows:
            rows[k]["auto_init_parts"] = int(n)
    ok = proc.returncode == 0 and set(rows) == set(keys)
    if not ok:
        print(f"[wints] INCOMPLETE at {sf_dir}: got {len(rows)}/{len(keys)} "
              f"keys, rc={proc.returncode}", flush=True)
        print((proc.stdout + proc.stderr)[-1500:], flush=True)
    return {"ok": ok, "jvm_wall_sec": wall, "passes": int(passes),
            "keys": rows}


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[1] if len(sys.argv) > 1 else "BENCH_wints_decade.json"
    keys = (sys.argv[2].split(",") if len(sys.argv) > 2
            else family_keys(repo))
    known = set(family_keys(repo))
    unknown = [k for k in keys if k not in known]
    if unknown:
        print(f"[wints] unknown keys (not q_win_*/q_ts_* in ops/): {unknown}")
        return 2
    print(f"[wints] {len(keys)} keys: {','.join(keys)}", flush=True)
    per_scale = {}
    for label, sf_dir, passes in SCALES:
        print(f"[wints] === {label} ({sf_dir}) ===", flush=True)
        per_scale[label] = run_scale(repo, sf_dir, keys, passes)
        print(f"[wints] {label} done in {per_scale[label]['jvm_wall_sec']}s",
              flush=True)
    derived = {}
    for k in keys:
        row = {}
        for label, _, _ in SCALES:
            r = per_scale[label]["keys"].get(k)
            if r is not None:
                row[label] = r["timed_sec"]
        if all(l in row for l in ("sf0.1", "sf1", "sf10")):
            # guard the tiny-denominator keys: a 0.2s -> 2.5s "12.5x" is
            # fixed-overhead noise, not a scale regime
            row["ratio_sf1_sf01"] = round(row["sf1"] / max(row["sf0.1"], 0.05), 2)
            row["ratio_sf10_sf1"] = round(row["sf10"] / max(row["sf1"], 0.05), 2)
            row["above_linear"] = (row["ratio_sf10_sf1"] > 12
                                   and row["sf10"] > 5.0)
        derived[k] = row
    flagged = sorted(k for k, r in derived.items() if r.get("above_linear"))
    artifact = {
        "metric": "plan-true (forced-hash consumer) window/TS decade series; "
                  "ratio_sf10_sf1 ~<= 10 = linear-or-better per decade",
        "method": "graft.QTime, SPARK_GRAFT_QTIME_AGG=hash, "
                  "SPARK_GRAFT_INIT_PARTITIONS=auto, fresh 64g JVM per "
                  "scale, 32 threads, min over timed passes",
        "run_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "scales": {l: {kk: vv for kk, vv in s.items() if kk != "keys"}
                   for l, s in per_scale.items()},
        "per_key": derived,
        "above_linear_keys": flagged,
        "raw": {l: s["keys"] for l, s in per_scale.items()},
    }
    with open(os.path.join(repo, out), "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    ok = all(s["ok"] for s in per_scale.values())
    print(f"[wints] ok={ok} above_linear={flagged} -> {out}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
