#!/usr/bin/env python3
"""sf100 relational ORACLE gate (r15; VERDICT r14 item 1): the third
decade was measured for 17 relational keys but hash-certified for only
three (q1/q6/q18). This gate dumps the engine's results at sf100 via
graft.Verify (multi-part dumps — coalesce(1) would serialize a 260 M-row
window sort into one task) and compares them against DuckDB running the
same oracle SQL over the same parquet, using verify_local.py's symmetric
EXCEPT ALL in-engine path for the 100 M+ row outputs.

Key choice = VERDICT r14's list: the three already-certified TPC-H shapes
re-run on the round's code (q18 carries the new pinned broadcast), plus
q3/q9/q21, the merge key, and the two spill-lever window keys.

Resource notes (single host, 128 GiB / ~60 GB free disk):
  - the Spark dump runs in one 64g JVM, 32 threads, per-query AutoParts
    AQE seed (the r16 engine default; session fallback 256);
  - the DuckDB compare gets more memory (60GB) and LESS temp (35GB) than
    the sf0.01 defaults — the dumps live on the same disk;
  - dumps land in a scratch dir and are deleted after the compare.

Usage: python3 tools/sf100_rel_gate.py [sf100Dir] [jsonOut] [keys]
       (defaults: testdata_sf100, CORRECTNESS_sf100rel.json, all KEYS; a
        comma-separated 3rd arg re-runs just those keys and merges into an
        existing jsonOut — each key's dump+compare is independent, so
        partial refresh is sound; every row carries run_utc.)
"""
import json
import os
import shutil
import subprocess
import sys
import time

KEYS = [
    "q_tpch_q1", "q_tpch_q3", "q_tpch_q6", "q_tpch_q9", "q_tpch_q18",
    "q_tpch_q21",
    "q_merge_upsert",
    "q_win_rolling_median", "q_win_cumsum",
    # r16 (VERDICT r15 item 5): the LLM-side oracle-expressible keys —
    # 5 M docs at sf100; the dedup/text family was property-checked only
    # at this decade until now
    "q_dedup_exact", "q_dedup_normalized", "q_dedup_decontaminate",
    "q_text_dsir",
    # r16 widening pass: the per-doc text-analysis keys (language id,
    # quality scoring, token counting, fingerprinting, stats)
    "q_text_langid", "q_text_quality", "q_text_tokens",
    "q_text_fingerprint", "q_text_stats",
    # r17 widening pass: the semi/anti join shapes (q4 EXISTS, q12
    # two-route CASE agg, q14 promo ratio) and the events-table windowed
    # shapes (sessionization, funnel) — none of the event analytics had a
    # third-decade oracle row before
    "q_tpch_q4", "q_tpch_q12", "q_tpch_q14",
    "q_ts_session", "q_funnel",
    # r18 widening pass (VERDICT r17 item 3): the window family's ranked /
    # tiled / streak / pattern / rolling-corr shapes, the range and as-of
    # joins, and the exact-moment aggregates — the DECIMAL(20,0)x(18,0)
    # moment chains are precisely the overflow/rounding class a 600 M-row
    # hash actually tests
    "q_win_rank", "q_win_ntile", "q_win_streak", "q_win_pattern",
    "q_win_rolling_corr",
    "q_join_range", "q_join_asof",
    "q_agg_corr", "q_agg_skewness", "q_agg_kurtosis", "q_agg_mad",
]


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "testdata_sf100"
    out = sys.argv[2] if len(sys.argv) > 2 else "CORRECTNESS_sf100rel.json"
    keys = sys.argv[3].split(",") if len(sys.argv) > 3 else KEYS
    unknown = [k for k in keys if k not in KEYS]
    if unknown:
        print(f"[sf100-rel-gate] unknown keys (not in KEYS): {unknown}")
        return 2
    out_path = os.path.join(repo, out)
    results = {}
    if os.path.exists(out_path):
        prior = json.load(open(out_path))
        # accept both the flat r14 shape and this tool's wrapped shape
        merged = prior.get("results", prior)
        # rows owned by tools/sf100_ts_gate.py (subset-form TS keys) are
        # ALWAYS preserved — they are certified by that tool, not this one
        results = {k: v for k, v in merged.items()
                   if isinstance(v, dict) and "form" in v}
        if len(sys.argv) > 3:
            results.update({k: v for k, v in merged.items()
                            if k not in results})
        stale = sorted(set(results) - set(KEYS)
                       - {k for k, v in results.items() if "form" in v})
        for k in stale:
            results.pop(k)
        if stale:
            print(f"[sf100-rel-gate] dropped stale merged rows: {stale}")

    dump = os.path.join(repo, ".sf100rel_dump")
    shutil.rmtree(dump, ignore_errors=True)
    # -D 256 is the session-default seed (what an analysis failure falls
    # back to); since r16 Verify applies the per-query AutoParts seed on
    # top — the gate certifies the engine-DEFAULT geometry users get.
    pinned = ("-Dspark.sql.adaptive.coalescePartitions"
              ".initialPartitionNum=256")
    extra = (os.environ.get("SPARK_EXTRA_JAVA_OPTS", "") + " "
             + pinned).strip()
    env = dict(os.environ,
               SPARK_GRAFT_VERIFY_ONLY=",".join(keys),
               SPARK_GRAFT_VERIFY_COALESCE="0",
               SPARK_GRAFT_CPUS="32",
               SPARK_GRAFT_INIT_PARTITIONS="auto",
               SPARK_EXTRA_JAVA_OPTS=extra)
    t0 = time.time()
    proc = subprocess.run(
        [os.path.join(repo, "tools", "run_class.sh"), "-mem", "64g",
         "graft.Verify", sf_dir, dump],
        capture_output=True, text=True, env=env, cwd=repo)
    dump_wall = round(time.time() - t0, 1)
    print(f"[sf100-rel-gate] dump: rc={proc.returncode} in {dump_wall}s",
          flush=True)
    if proc.returncode != 0:
        print((proc.stdout + proc.stderr)[-1500:])
        return 1
    fails = json.load(open(f"{dump}/failures.json"))
    if fails:
        print(f"[sf100-rel-gate] Verify failures: {fails}")
        # fall through: failed keys have no dump dir and will ERROR in the
        # compare; their rows record the failure instead of vanishing

    cmp_env = dict(os.environ,
                   GRAFT_DUCKDB_MEM=os.environ.get("GRAFT_DUCKDB_MEM",
                                                   "60GB"),
                   GRAFT_DUCKDB_TEMP=os.environ.get("GRAFT_DUCKDB_TEMP",
                                                    "35GB"))
    cmp_json = os.path.join(dump, "cmp.json")
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "verify_local.py"),
         sf_dir, dump, cmp_json],
        capture_output=True, text=True, env=cmp_env, cwd=repo)
    cmp_wall = round(time.time() - t0, 1)
    print(proc.stdout[-3000:])
    print(f"[sf100-rel-gate] compare: rc={proc.returncode} in {cmp_wall}s",
          flush=True)
    if not os.path.exists(cmp_json):
        print((proc.stderr)[-1500:])
        return 1
    run_utc = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    for k, row in json.load(open(cmp_json)).items():
        row["run_utc"] = run_utc
        results[k] = row
    shutil.rmtree(dump, ignore_errors=True)

    n_pass = sum(1 for r in results.values() if r.get("hash_match") is True)
    artifact = {
        "metric": "sf100 relational ORACLE gate (hash-certified vs DuckDB "
                  "at the third measured decade)",
        "corpus": f"{sf_dir}: ScaleGen factor-1000 relational tables "
                  "(600M lineitem / 150M orders / 100M events; "
                  "tools/regen_sf100.sh)",
        "method": "graft.Verify multi-part dump (64g JVM, 32 threads, AQE "
                  "seed auto per query since r16 — AutoParts, session "
                  "default 256) -> tools/verify_local.py "
                  "DuckDB compare; outputs past GRAFT_BIG_COMPARE_ROWS "
                  "verified in-engine via symmetric EXCEPT ALL "
                  "(multiset semantics)",
        "pass": n_pass,
        "total": len(results),
        "results": {k: results[k] for k in sorted(results)},
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"[sf100-rel-gate] {n_pass}/{len(results)} hash-green -> {out}")
    return 0 if n_pass == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())
