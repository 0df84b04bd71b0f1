#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query output
parquet written by graft.Verify, run the oracle SQL in DuckDB over the same
source tables and compare (columns sorted by name, rows sorted, exact values).

Usage: python3 tools/verify_local.py <sfDir> <outDir> [jsonOut]

With a third argument, also writes the per-query results as driver-style
JSON ({rows_match, schema_match, hash_match, spark_rows, oracle_rows, err}
per key, same shape as the driver's CORRECTNESS_r{N}.json) — no-oracle keys
are folded in from <outDir>/no_oracle_results.json with their in-run
verdicts, so the artifact covers the whole registry.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # tz-aware -> naive for comparison robustness
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            try:
                df[c] = df[c].dt.tz_localize(None)
            except TypeError:
                pass
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str, json_out: str = None) -> int:
    import os
    con = duckdb.connect()
    # bound the oracle's own resources: the sf1 q_graph_triangles pair
    # self-join spilled >120 GB before dying on a full disk (r11) — cap the
    # temp directory so an oracle-side blow-up fails cleanly as that
    # query's ERROR row instead of taking the machine's disk with it
    # overridable for the sf100 gate: its EXCEPT ALL compares touch 260 M-row
    # outputs (more oracle memory helps) on a disk where 50 GB of DuckDB temp
    # would not fit beside the dumps (less temp is mandatory)
    con.execute("SET memory_limit='%s'"
                % os.environ.get("GRAFT_DUCKDB_MEM", "40GB"))
    con.execute("SET max_temp_directory_size='%s'"
                % os.environ.get("GRAFT_DUCKDB_TEMP", "50GB"))
    for t in TABLES:
        # driver testdata ships single files; ScaleGen's sf1 probe tables are
        # Spark-written directories — glob their part files in that case
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # key -> driver-style result row (oracle keys; no-oracle folded in at end)
    results = {}

    def record(name, rows_match=None, schema_match=None, hash_match=None,
               spark_rows=None, oracle_rows=None, err=None):
        results[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": spark_rows,
            "oracle_rows": oracle_rows, "err": err,
        }

    # Past this many output rows the pandas sort-and-compare path is the
    # bottleneck (not the engines): compare in DuckDB instead — symmetric
    # EXCEPT ALL is hash-based, spills under the caps above, and its
    # multiset semantics (NULL==NULL, NaN==NaN) match the pandas path.
    BIG_ROWS = int(os.environ.get("GRAFT_BIG_COMPARE_ROWS", 15_000_000))

    for name, sql in sorted(oracle.items()):
        try:
            dump = f"{out_dir}/{name}/*.parquet"
            got_rel = con.sql(f"SELECT * FROM '{dump}'")
            want_rel = con.sql(sql)
            # Dtype-strict gate: the driver hashes typed values, so a DuckDB
            # HUGEINT (e.g. un-cast sum(BIGINT)) vs Spark BIGINT must FAIL
            # here even though the Python ints compare equal below.
            def typemap(rel):
                # Collapse tz-ness of timestamps (value compare already
                # normalizes it); keep integer/decimal widths strict.
                return {
                    c: ("TIMESTAMP" if str(t).startswith("TIMESTAMP") else str(t))
                    for c, t in zip(rel.columns, rel.types)
                }
            g_types, w_types = typemap(got_rel), typemap(want_rel)
            g_cols = sorted(g_types)
            if g_cols != sorted(w_types):
                print(f"FAIL {name}: columns {g_cols} != {sorted(w_types)}")
                record(name, schema_match=False, hash_match=False)
                n_fail += 1
                continue
            type_diff = {
                c: (g_types[c], w_types[c])
                for c in g_cols if g_types[c] != w_types[c]
            }
            if type_diff:
                print(f"FAIL {name}: dtype mismatch (spark vs duckdb): {type_diff}")
                record(name, schema_match=False, hash_match=False)
                n_fail += 1
                continue
            n_g = con.sql(f"SELECT count(*) FROM '{dump}'").fetchone()[0]
            if n_g > BIG_ROWS:
                # in-engine multiset compare; tz-collapse timestamps the way
                # normalize() does, and sort the column list the same way
                def sel(src):
                    return ", ".join(
                        (f'CAST("{c}" AS TIMESTAMP) AS "{c}"'
                         if g_types[c] == "TIMESTAMP" else f'"{c}"')
                        for c in g_cols) + f" FROM {src}"
                row = con.sql(
                    f"WITH o AS MATERIALIZED ({sql}),\n"
                    f"  g AS (SELECT * FROM '{dump}'),\n"
                    f"  d1 AS (SELECT {sel('g')} EXCEPT ALL SELECT {sel('o')}),\n"
                    f"  d2 AS (SELECT {sel('o')} EXCEPT ALL SELECT {sel('g')})\n"
                    "SELECT (SELECT count(*) FROM o),\n"
                    "  (SELECT count(*) FROM d1) + (SELECT count(*) FROM d2)"
                ).fetchone()
                n_w, n_diff = row
                if n_g != n_w:
                    print(f"FAIL {name}: rows {n_g} != {n_w}")
                    record(name, rows_match=False, schema_match=True,
                           hash_match=False, spark_rows=n_g, oracle_rows=n_w)
                    n_fail += 1
                elif n_diff != 0:
                    print(f"FAIL {name}: {n_diff} rows differ (in-engine compare)")
                    record(name, rows_match=True, schema_match=True,
                           hash_match=False, spark_rows=n_g, oracle_rows=n_w)
                    n_fail += 1
                else:
                    print(f"PASS {name} ({n_g} rows, in-engine compare)")
                    record(name, rows_match=True, schema_match=True,
                           hash_match=True, spark_rows=n_g, oracle_rows=n_w)
                    n_pass += 1
                continue
            got, want = got_rel.df(), want_rel.df()
            g, w = normalize(got), normalize(want)
            if len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} != {len(w)}")
                record(name, rows_match=False, schema_match=True,
                       hash_match=False, spark_rows=len(g), oracle_rows=len(w))
                n_fail += 1
                continue
            g = g.astype(object).where(pd.notnull(g), None)
            w = w.astype(object).where(pd.notnull(w), None)
            if not g.equals(w):
                neq = (g != w)
                bad_cols = [c for c in g.columns if neq[c].any()]
                print(f"FAIL {name}: value mismatch in {bad_cols}")
                for c in bad_cols[:2]:
                    idx = neq[c].idxmax()
                    print(f"  {c}[{idx}]: spark={g[c][idx]!r} duckdb={w[c][idx]!r}")
                record(name, rows_match=True, schema_match=True,
                       hash_match=False, spark_rows=len(g), oracle_rows=len(w))
                n_fail += 1
                continue
            print(f"PASS {name} ({len(g)} rows)")
            record(name, rows_match=True, schema_match=True, hash_match=True,
                   spark_rows=len(g), oracle_rows=len(w))
            n_pass += 1
        except Exception as e:  # noqa: BLE001
            # Distinguish the ORACLE's own resource death (DuckDB hitting the
            # memory/temp caps set above — the engine side computed fine) from
            # a genuine comparison error; both still count as run failures.
            msg = f"{type(e).__name__}: {e}"
            if "Out of Memory" in msg or "max_temp_directory_size" in msg:
                msg = f"oracle_resource_bound: {msg}"
            print(f"ERROR {name}: {msg}")
            record(name, err=msg)
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    if json_out:
        # Fold in the no-oracle keys with their in-run PropertyChecks
        # verdicts so the artifact covers the whole registry; a failed check
        # counts as a failure of the run, same as a hash mismatch.
        try:
            props = json.load(open(f"{out_dir}/no_oracle_results.json"))
        except FileNotFoundError:
            props = {}
        for name, v in sorted(props.items()):
            ok = v.get("pass", v.get("ok"))
            results[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": None, "oracle_rows": None,
                "err": "no_oracle",
                "property_depth": v.get("depth"),
                "property_pass": ok,
                "property_detail": v.get("detail"),
            }
            if ok is False:
                n_fail += 1
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        print(f"wrote {json_out} ({len(results)} keys)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:4]))
