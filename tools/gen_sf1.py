#!/usr/bin/env python3
"""Derive an sf1 (10x) testdata set from the driver's read-only sf0.1.

The driver only ships sf{0.001,0.01,0.1} (TESTDATA.md) and /root/testdata is
read-only, so the 10x scale probe derives its corpus from sf0.1 instead of
re-guessing the generator: each fact table is 10 key-shifted copies of the
sf0.1 table (key offset = k * max_key_per_copy, preserving every FK
relationship within a copy), while region/nation stay fixed — the same shape
TPC-H itself scales with. Observed driver scaling (sf0.01 -> sf0.1) is linear
for every table except embeddings (500 -> 2000, 4x per decade), so
embeddings get 4 copies, everything else 10.

Two tables need per-copy decorrelation so similarity workloads SCALE instead
of artificially exploding (10 verbatim copies of every doc would hand every
LSH bucket 10x membership = 100x pairs — a different workload, not a bigger
one):
  - documents.text: copy k applies a Caesar shift of k to every letter — a
    BIJECTION on words, so intra-copy token counts, lengths, and n-gram
    similarity structure are byte-for-byte isomorphic to copy 0, while
    cross-copy shingle overlap drops to ~zero. (Stopword/langid profiles do
    shift for k>0; acceptable for a timing corpus, noted in SURVEY.)
  - embeddings.embedding: copy k cyclically rotates the 64-dim vector by
    16*k — norms and intra-copy geometry are exactly preserved (rotation is
    orthogonal), cross-copy cosines decorrelate.

Usage: python3 tools/gen_sf1.py [out_dir]   (default /root/repo/testdata_sf1)
"""
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
K = 10       # copies for linear tables
KE = 4       # copies for embeddings (matches observed 4x-per-decade)

# per-copy key offsets = sf0.1 max_key + 1
OFF = dict(cust=15000, supp=1000, part=20000, order=150000,
           event=100000, user=1500, doc=5000, vec=2000)


def main():
    import os
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET preserve_insertion_order=false")

    def copy(table, select, copies=K):
        con.execute(f"COPY ({select}) TO '{DST}/{table}.parquet' "
                    f"(FORMAT PARQUET, COMPRESSION SNAPPY)")
        n = con.sql(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    # fixed dimensions: straight copies
    for t in ("region", "nation"):
        copy(t, f"SELECT * FROM '{SRC}/{t}.parquet'")

    copy("customer", f"""
      SELECT c_custkey + k*{OFF['cust']} AS c_custkey,
             printf('Customer#%09d', c_custkey + k*{OFF['cust']}) AS c_name,
             c_nationkey, c_acctbal, c_mktsegment
      FROM range({K}) t(k), '{SRC}/customer.parquet'""")

    copy("supplier", f"""
      SELECT s_suppkey + k*{OFF['supp']} AS s_suppkey,
             printf('Supplier#%09d', s_suppkey + k*{OFF['supp']}) AS s_name,
             s_nationkey, s_acctbal
      FROM range({K}) t(k), '{SRC}/supplier.parquet'""")

    copy("part", f"""
      SELECT p_partkey + k*{OFF['part']} AS p_partkey,
             p_name, p_brand, p_type, p_size, p_retailprice
      FROM range({K}) t(k), '{SRC}/part.parquet'""")

    copy("orders", f"""
      SELECT o_orderkey + k*{OFF['order']} AS o_orderkey,
             o_custkey + k*{OFF['cust']} AS o_custkey,
             o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM range({K}) t(k), '{SRC}/orders.parquet'""")

    copy("lineitem", f"""
      SELECT l_orderkey + k*{OFF['order']} AS l_orderkey,
             l_partkey + k*{OFF['part']} AS l_partkey,
             l_suppkey + k*{OFF['supp']} AS l_suppkey,
             l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
             l_returnflag, l_linestatus, l_shipdate
      FROM range({K}) t(k), '{SRC}/lineitem.parquet'""")

    # events: same one-month window (density scales, like the driver's own
    # sf0.01->sf0.1 step); per-copy user shift keeps per-user series lengths
    copy("events", f"""
      SELECT event_id + k*{OFF['event']} AS event_id, ts,
             user_id + k*{OFF['user']} AS user_id,
             event_type, value, props
      FROM range({K}) t(k), '{SRC}/events.parquet'""")

    # documents: Caesar-shift copy k (bijective on words; see module doc).
    # translate() with a shifted alphabet does the whole transform in SQL.
    az = "abcdefghijklmnopqrstuvwxyz"
    cases_txt = " ".join(
        f"WHEN {k} THEN translate(text, '{az}', '{az[k % 26:]}{az[:k % 26]}')"
        for k in range(K))
    copy("documents", f"""
      SELECT doc_id + k*{OFF['doc']} AS doc_id,
             CASE k {cases_txt} END AS text,
             lang, source, n_chars
      FROM range({K}) t(k), '{SRC}/documents.parquet'""")

    # embeddings: orthogonal (cyclic-rotation) decorrelation per copy
    rot = " ".join(
        f"WHEN {k} THEN embedding[{16*k + 1}:64] || embedding[1:{16*k}]"
        if k > 0 else "WHEN 0 THEN embedding"
        for k in range(KE))
    copy("embeddings", f"""
      SELECT vec_id + k*{OFF['vec']} AS vec_id,
             CAST(CASE k {rot} END AS FLOAT[]) AS embedding,
             label
      FROM range({KE}) t(k), '{SRC}/embeddings.parquet'""", copies=KE)

    # sanity: FK closure + decorrelation spot-checks
    assert con.sql(f"""SELECT count(*) FROM '{DST}/lineitem.parquet' l
      LEFT JOIN '{DST}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderkey IS NULL""").fetchone()[0] == 0, "lineitem FK broken"
    assert con.sql(f"""SELECT count(*) FROM '{DST}/orders.parquet' o
      LEFT JOIN '{DST}/customer.parquet' c ON o.o_custkey = c.c_custkey
      WHERE c.c_custkey IS NULL""").fetchone()[0] == 0, "orders FK broken"
    assert con.sql(f"""SELECT count(DISTINCT text) FROM
      '{DST}/documents.parquet'""").fetchone()[0] >= K * con.sql(
      f"SELECT count(DISTINCT text) FROM '{SRC}/documents.parquet'"
      ).fetchone()[0] * 0.99, "text copies not decorrelated"
    # vector norms preserved exactly by rotation
    assert con.sql(f"""
      WITH a AS (SELECT vec_id % {OFF['vec']} AS base,
                        list_sum([x*x for x in embedding]) AS n2
                 FROM '{DST}/embeddings.parquet')
      SELECT count(*) FROM (
        SELECT base FROM a GROUP BY base
        HAVING max(n2) - min(n2) > 1e-3)""").fetchone()[0] == 0, \
        "rotation changed norms"
    print("OK: FK closure + decorrelation checks passed")


if __name__ == "__main__":
    main()
