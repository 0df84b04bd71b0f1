#!/usr/bin/env python3
"""sf100 TS oracle gate for the spine keys (r17; VERDICT r16 item 6):
q_ts_gapfill / q_ts_interp_linear produce a 1.05 B-row hourly spine at
sf100 — BENCH_interp_sf100.json times them there, but no oracle existed
past sf10 (a full-frame EXCEPT ALL at 1.05e9 rows does not fit this
host's disk beside the dumps). This gate certifies them in the SUBSET
form (recorded as such):

  - engine side: graft.SubsetDump writes each key's output restricted to
    `user_id % 97 == 0` (~1% of series; both keys are per-series
    independent, so the restriction is exact) plus the FULL row count;
  - oracle side: DuckDB builds the same subset by filtering the `events`
    view BEFORE the unchanged registry oracle SQL, compares with
    symmetric EXCEPT ALL (multiset-exact on every subset row), and
    derives the full spine count analytically
    (sum over series of (max_bkt - min_bkt)/3600 + 1) as an independent
    check on the engine's total.

Rows merge into CORRECTNESS_sf100rel.json with form="subset(user_id%97)
+analytic-count" so the artifact records exactly what was certified.

Usage: python3 tools/sf100_ts_gate.py [sf100Dir] [jsonOut]
"""
import json
import os
import shutil
import subprocess
import sys
import time

KEYS = ["q_ts_gapfill", "q_ts_interp_linear"]
MOD = 97

COUNT_ORACLE = """
WITH b AS (
  SELECT user_id,
    CAST(floor(floor(epoch(ts)) / 3600) * 3600 AS BIGINT) AS bkt
  FROM events GROUP BY 1, 2),
bounds AS (SELECT user_id, min(bkt) AS b0, max(bkt) AS b1 FROM b GROUP BY 1)
SELECT CAST(sum((b1 - b0) // 3600 + 1) AS BIGINT) FROM bounds
"""


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "testdata_sf100"
    out = sys.argv[2] if len(sys.argv) > 2 else "CORRECTNESS_sf100rel.json"
    out_path = os.path.join(repo, out)

    dump = os.path.join(repo, ".sf100ts_dump")
    shutil.rmtree(dump, ignore_errors=True)
    env = dict(os.environ, SPARK_GRAFT_CPUS="32",
               SPARK_GRAFT_INIT_PARTITIONS="auto")
    t0 = time.time()
    proc = subprocess.run(
        [os.path.join(repo, "tools", "run_class.sh"), "-mem", "64g",
         "graft.SubsetDump", sf_dir, dump, ",".join(KEYS), str(MOD)],
        capture_output=True, text=True, env=env, cwd=repo)
    dump_wall = round(time.time() - t0, 1)
    print(f"[sf100-ts-gate] dump: rc={proc.returncode} in {dump_wall}s",
          flush=True)
    totals = {}
    for line in proc.stdout.splitlines():
        if line.startswith('{"key":'):
            row = json.loads(line)
            totals[row["key"]] = row["rows_total"]
    if proc.returncode != 0 or set(totals) != set(KEYS):
        print((proc.stdout + proc.stderr)[-1500:])
        return 1

    import duckdb  # driver-side tool; not an engine dependency
    con = duckdb.connect()
    con.execute("SET memory_limit='%s'"
                % os.environ.get("GRAFT_DUCKDB_MEM", "60GB"))
    con.execute("SET max_temp_directory_size='%s'"
                % os.environ.get("GRAFT_DUCKDB_TEMP", "35GB"))
    ev = f"{sf_dir}/events.parquet"
    ev_src = f"{ev}/*.parquet" if os.path.isdir(ev) else ev
    # the subset is created at the SOURCE view: both keys are per-series
    # independent, so oracle-over-filtered-events == filtered-oracle
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{ev_src}' "
        f"WHERE user_id % {MOD} = 0")

    oracle_sql = {}
    # pull the registry oracles from a tiny sf0.01 Verify oracle dump if
    # present, else ask the engine to print them
    proc = subprocess.run(
        [os.path.join(repo, "tools", "run_class.sh"), "-mem", "4g",
         "graft.OracleSqlDump", ",".join(KEYS)],
        capture_output=True, text=True, env=env, cwd=repo)
    if proc.returncode == 0:
        oracle_sql = json.loads(proc.stdout.splitlines()[-1])
    if set(oracle_sql) != set(KEYS):
        print(f"[sf100-ts-gate] oracle SQL fetch failed: "
              f"{(proc.stdout + proc.stderr)[-800:]}")
        return 1

    results = {}
    if os.path.exists(out_path):
        prior = json.load(open(out_path))
        results = prior.get("results", prior)

    run_utc = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    n_ok = 0
    # analytic full-spine count (same for both keys: one row per spine pt);
    # computed over the UNFILTERED events
    con.execute("CREATE VIEW events_full AS SELECT * FROM '%s'" % ev_src)
    t0 = time.time()
    analytic = con.sql(
        COUNT_ORACLE.replace("FROM events", "FROM events_full")).fetchone()[0]
    print(f"[sf100-ts-gate] analytic spine count = {analytic} "
          f"({round(time.time()-t0, 1)}s)", flush=True)

    for key in KEYS:
        t0 = time.time()
        sql = oracle_sql[key]
        sub = f"{dump}/{key}/*.parquet"
        row = {"form": f"subset(user_id%{MOD})+analytic-count",
               "run_utc": run_utc}
        try:
            got_n = con.sql(f"SELECT count(*) FROM '{sub}'").fetchone()[0]
            diff = con.sql(
                f"SELECT count(*) FROM ("
                f"(SELECT * FROM '{sub}' EXCEPT ALL ({sql})) UNION ALL "
                f"((({sql})) EXCEPT ALL SELECT * FROM '{sub}'))"
            ).fetchone()[0]
            want_n = con.sql(f"SELECT count(*) FROM ({sql})").fetchone()[0]
            count_ok = totals[key] == analytic
            subset_ok = diff == 0 and got_n == want_n and got_n > 0
            row.update({
                "rows_match": subset_ok and count_ok,
                "schema_match": subset_ok,
                "hash_match": subset_ok and count_ok,
                "spark_rows": totals[key],
                "oracle_rows": analytic,
                "subset_rows": got_n,
                "subset_diff": diff,
                "err": None if (subset_ok and count_ok) else
                       f"subset_diff={diff} got={got_n} want={want_n} "
                       f"total={totals[key]} analytic={analytic}",
            })
            ok = subset_ok and count_ok
        except Exception as e:  # noqa: BLE001 — the row records the error
            row.update({"rows_match": False, "schema_match": None,
                        "hash_match": False, "spark_rows": totals.get(key),
                        "oracle_rows": None, "err": str(e)[:300]})
            ok = False
        n_ok += ok
        results[key] = row
        print(f"[sf100-ts-gate] {key}: {'PASS' if ok else 'FAIL'} "
              f"({round(time.time()-t0, 1)}s) {row.get('err') or ''}",
              flush=True)

    n_pass = sum(1 for r in results.values() if r.get("hash_match") is True)
    artifact = {
        "metric": "sf100 relational ORACLE gate (hash-certified vs DuckDB "
                  "at the third measured decade; TS spine keys in the "
                  "recorded subset form — see tools/sf100_ts_gate.py)",
        "corpus": "testdata_sf100: ScaleGen factor-1000 relational tables "
                  "(600M lineitem / 150M orders / 100M events; "
                  "tools/regen_sf100.sh)",
        "method": "graft.Verify multi-part dump (64g JVM, 32 threads, AQE "
                  "seed auto per query since r16 — AutoParts, session "
                  "default 256) -> tools/verify_local.py DuckDB compare; "
                  "outputs past GRAFT_BIG_COMPARE_ROWS verified in-engine "
                  "via symmetric EXCEPT ALL (multiset semantics); TS spine "
                  "keys via graft.SubsetDump + tools/sf100_ts_gate.py "
                  "(form field on the row)",
        "pass": n_pass,
        "total": len(results),
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    shutil.rmtree(dump, ignore_errors=True)
    print(f"[sf100-ts-gate] {n_ok}/{len(KEYS)} TS keys ok -> {out} "
          f"(artifact now {n_pass}/{len(results)})")
    return 0 if n_ok == len(KEYS) else 1


if __name__ == "__main__":
    sys.exit(main())
