#!/usr/bin/env python3
"""sf100 pair-graph gate (r17; VERDICT r16 item 2): drive the MinHash-served
graph family (clusters / degrees / triangles / pagerank) through its third
measured decade — 5 M docs, the scale where the exact pair index is
volume-refused and the banding-candidates + exact-verify-tail path is the
only one. Everything else LLM-side already had sf100 evidence.

Per key: `graft.RunOne <key> testdata_sf100 --check` in a fresh 64g JVM —
the scaleChecks verdicts recompute every edge's full-set jaccard exactly,
replay each kernel driver-side on the same edges (union-find / degree+rank /
triangle count / 10 integer PageRank iterations), and run the
subcorpus-superset RECALL witness vs testdata_sf10 (derived from the
ScaleGen naming convention). Timings: graft.QTime min-of-2 warm at sf10
then sf100 back-to-back (same-host decade ratios); graph size from the
q_graph_triangles row at each scale.

Usage: python3 tools/sf100_graph_gate.py [jsonOut]
       (default BENCH_graph_sf100.json; needs testdata_sf10 + testdata_sf100)
"""
import json
import os
import re
import subprocess
import sys
import time

CHECK_KEYS = [
    "q_dedup_clusters",
    "q_graph_degrees",
    "q_graph_triangles",
    "q_graph_pagerank",
]


def run(repo, args, mem="64g", env=None):
    return subprocess.run(
        [os.path.join(repo, "tools", "run_class.sh"), "-mem", mem] + args,
        capture_output=True, text=True, env=env, cwd=repo)


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[1] if len(sys.argv) > 1 else "BENCH_graph_sf100.json"
    env = dict(os.environ, SPARK_GRAFT_CPUS="32",
               SPARK_GRAFT_QTIME_PASSES="1")

    verification, n_pass = {}, 0
    for key in CHECK_KEYS:
        t0 = time.time()
        proc = run(repo, ["graft.RunOne", key, "testdata_sf100", "--check"],
                   env=env)
        wall = round(time.time() - t0, 1)
        verdict = ""
        for line in proc.stdout.splitlines():
            if line.startswith(("PASS:", "FAIL:")):
                verdict = line
        ok = proc.returncode == 0 and verdict.startswith("PASS:")
        n_pass += ok
        verification[key] = {
            "ok": ok,
            "check_wall_sec": wall,
            "verdict": verdict or (proc.stdout + proc.stderr)[-400:],
        }
        print(f"[sf100-graph-gate] check {key}: {'PASS' if ok else 'FAIL'} "
              f"({wall}s)", flush=True)

    scales = {}
    for sf, d in (("sf10", "testdata_sf10"), ("sf100", "testdata_sf100")):
        proc = run(repo, ["graft.QTime", d, ",".join(CHECK_KEYS)], env=env)
        times = {}
        for m in re.finditer(
                r"\[qtime\] (\S+) rows=(\d+) min=([\d.]+) s", proc.stdout):
            times[m.group(1)] = float(m.group(3))
        tri = run(repo, ["graft.RunOne", "q_graph_triangles", d], env=env)
        counts = re.search(r"\[(\d+),(\d+),(\d+)\]", tri.stdout)
        scales[sf] = dict(times)
        if counts:
            scales[sf].update(
                nodes=int(counts.group(1)), edges=int(counts.group(2)),
                triangles=int(counts.group(3)))
        print(f"[sf100-graph-gate] {sf}: {scales[sf]}", flush=True)

    ratios = {
        k: round(scales["sf100"][k] / scales["sf10"][k], 2)
        for k in CHECK_KEYS
        if scales.get("sf10", {}).get(k) and scales.get("sf100", {}).get(k)
    }
    artifact = {
        "metric": "pair-graph family third decade (sf100, 5M docs; "
                  "regenerated live by tools/sf100_graph_gate.py)",
        "method": "graft.QTime min-of-2 warm, 32 cpus, one JVM per scale, "
                  "back-to-back sf10 then sf100; verification = graft.RunOne "
                  "--check per key in a fresh 64g JVM "
                  "(SPARK_GRAFT_QTIME_PASSES=1) — exact edge recompute + "
                  "driver-side kernel replay + subcorpus-superset recall "
                  "witness vs testdata_sf10",
        "note": "warm = the MatCache'd pair graph is built once per "
                "session; the banding+verify edge derivation is the "
                "data-bound part. The verdict strings carry the witness "
                "counts.",
        "pass": n_pass,
        "total": len(CHECK_KEYS),
        "sf10": scales.get("sf10", {}),
        "sf100": scales.get("sf100", {}),
        "decade_ratios": ratios,
        "verification": verification,
    }
    with open(os.path.join(repo, out), "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    print(f"[sf100-graph-gate] {n_pass}/{len(CHECK_KEYS)} -> {out}")
    return 0 if n_pass == len(CHECK_KEYS) else 1


if __name__ == "__main__":
    sys.exit(main())
