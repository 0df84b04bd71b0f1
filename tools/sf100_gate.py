#!/usr/bin/env python3
"""Durable sf100 verification gate (r13; VERDICT r12 item 7): run the
strong in-run verdicts that are valid on the sf100 probe corpus
(documents + embeddings only) and write them as a committed artifact, so
the third measured decade's verification is reproducible instead of a
one-off session.

Each key runs `graft.RunOne <key> <sf100Dir> --check` in a FRESH 64g JVM
(the spill-heavy checks need the heap, and a shared JVM's leftover
checkpoint blocks contaminate later keys — the Bench sweep lesson).
SPARK_GRAFT_QTIME_PASSES=1 is exported so spill frees between passes.

Usage: python3 tools/sf100_gate.py [sf100Dir] [jsonOut] [keys]
       (defaults: testdata_sf100, CORRECTNESS_sf100-subset.json, all KEYS;
        a comma-separated 3rd arg re-runs just those keys and merges them
        into an existing jsonOut — each key's check is an independent
        fresh-JVM run, so a partial refresh of the keys whose code changed
        is sound while the untouched keys' rows stand)
"""
import json
import os
import subprocess
import sys
import time

# The checks that are meaningful at sf100: candidate-path precision
# (cosines/jaccards recomputed exact on full sets) plus, for the pair
# graph, the subcorpus-superset RECALL witness vs testdata_sf10 (the
# graph-family keys share q_dedup_ngram_jaccard's edge set and witness;
# running one avoids re-deriving the same sf10 subgraph four times).
KEYS = [
    "q_dedup_near_minhash",
    "q_dedup_ngram_jaccard",
    "q_dedup_embed_lsh",
    "q_sim_ann_lsh",
    "q_sim_knn_graph",
    "q_dedup_semantic",
]


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "testdata_sf100"
    out = sys.argv[2] if len(sys.argv) > 2 else "CORRECTNESS_sf100-subset.json"
    keys = sys.argv[3].split(",") if len(sys.argv) > 3 else KEYS
    # ADVICE r14: a typo'd 3rd-arg key would otherwise create a bogus row
    # counted in pass/total; fail loudly instead.
    unknown = [k for k in keys if k not in KEYS]
    if unknown:
        print(f"[sf100-gate] unknown keys (not in KEYS): {unknown}")
        return 2
    out_path = os.path.join(repo, out)
    results = {}
    if len(sys.argv) > 3 and os.path.exists(out_path):
        results = json.load(open(out_path)).get("results", {})
        # drop rows for keys since removed from KEYS — stale rows must not
        # keep counting toward pass/total after the gate's scope changes
        stale = sorted(set(results) - set(KEYS))
        if stale:
            print(f"[sf100-gate] dropping stale merged rows: {stale}")
            for k in stale:
                results.pop(k)
    # Append the pinned flag to any caller-exported SPARK_EXTRA_JAVA_OPTS
    # instead of replacing it (ADVICE r13: overwriting discarded exactly
    # the A/B flags run_class.sh documents this variable for).
    pinned = ("-Dspark.sql.adaptive.coalescePartitions"
              ".initialPartitionNum=256")
    extra = (os.environ.get("SPARK_EXTRA_JAVA_OPTS", "") + " " + pinned).strip()
    env = dict(os.environ, SPARK_GRAFT_QTIME_PASSES="1",
               SPARK_GRAFT_CPUS="32",
               # numeric value also disables the r16 per-query auto default
               SPARK_GRAFT_INIT_PARTITIONS="256",
               SPARK_EXTRA_JAVA_OPTS=extra)
    for key in keys:
        t0 = time.time()
        proc = subprocess.run(
            [os.path.join(repo, "tools", "run_class.sh"), "-mem", "64g",
             "graft.RunOne", key, sf_dir, "--check"],
            capture_output=True, text=True, env=env, cwd=repo)
        wall = round(time.time() - t0, 1)
        verdict = ""
        for line in proc.stdout.splitlines():
            if line.startswith(("PASS:", "FAIL:")):
                verdict = line
        ok = proc.returncode == 0 and verdict.startswith("PASS:")
        results[key] = {
            "ok": ok,
            "depth": "strong",
            "wall_sec": wall,
            # per-row timestamp (ADVICE r14): partial refreshes merge into
            # the artifact, so each row must carry WHEN it was measured
            "run_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "verdict": verdict or (proc.stdout + proc.stderr)[-400:],
        }
        print(f"[sf100-gate] {key}: {'PASS' if ok else 'FAIL'} ({wall}s)",
              flush=True)
    artifact = {
        "metric": "sf100 strong-verdict subset (third measured decade)",
        "corpus": f"{sf_dir}: ScaleGen factor-1000 documents + embeddings "
                  "(5M docs / 2M vectors; tools/regen_sf100.sh — the "
                  "checked keys read only these two tables)",
        "method": "graft.RunOne --check, fresh 64g JVM per key, "
                  "SPARK_GRAFT_QTIME_PASSES=1",
        "pass": sum(r["ok"] for r in results.values()),
        "total": len(results),
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    n_pass = sum(r["ok"] for r in results.values())
    print(f"[sf100-gate] {n_pass}/{len(results)} -> {out}")
    return 0 if n_pass == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())
