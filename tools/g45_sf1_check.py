#!/usr/bin/env python3
"""Staged (per-copy) sf1 oracle for g45_scc.

The single-statement g45 oracle computes a transitive closure over the
part/supplier subgraph; at sf1 the recursive CTE's working set needs a
>32 GiB contiguous allocation and OOMs at any realistic memory_limit
(measured: `failed to allocate 32.0 GiB` at an 80 GB cap). This script
is the bounded-memory STAGED RECOUNT of the same definition:

  - cycles are confined to part/supplier nodes (the oracle's own
    argument: the only back edges are supplier->part, and the forward
    derivation from tags 2/3 only descends);
  - under the scaleup.py tiling, part and supplier keys are copy-local
    (each copy's lineitem references its own shifted part/supplier
    keys), so the part/supplier subgraph is a DISJOINT union of
    COPIES copies and `mutual` decomposes exactly;
  - therefore: run the SAME closure + mutual-min per copy (each one
    sf0.1-sized, which completes in minutes), union the results, and
    left-join onto the global node set — identical output to the
    one-shot oracle by construction.

Usage: g45_sf1_check.py SF1_DIR SRC_DIR SPARK_PARQUET_DIR [COPIES]
  SF1_DIR  tiled directory (e.g. /tmp/sf1)
  SRC_DIR  the tiling SOURCE (e.g. /root/testdata/sf0.1) — key spans
  SPARK_PARQUET_DIR  Verify output dir holding g45_scc/*.parquet
Prints PASS/FAIL with mismatch counts.
"""
import glob
import os
import sys

import duckdb

def main():
    sf1, src, spark_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    copies = int(sys.argv[4]) if len(sys.argv) > 4 else 10
    con = duckdb.connect()
    con.execute("SET memory_limit='48GB'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in ["orders", "lineitem", "customer", "supplier", "nation"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf1}/{t}.parquet')")
    # key spans of the tiling SOURCE: scaleup.py shifts copy k's keys
    # by k * (max_key + 1)
    span_p = con.execute(
        f"SELECT max(p_partkey) + 1 FROM read_parquet('{src}/part.parquet')"
    ).fetchone()[0]
    span_s = con.execute(
        f"SELECT max(s_suppkey) + 1 FROM read_parquet('{src}/supplier.parquet')"
    ).fetchone()[0]
    print(f"spans: part={span_p} supplier={span_s}", flush=True)

    # de / dnodes / ps: same definitions as GraphOps.g45Sql
    con.execute("""
      CREATE TEMP TABLE de AS
      SELECT DISTINCT src, dst FROM (
        SELECT CAST(o_custkey*8+0 AS BIGINT) AS src, CAST(o_orderkey*8+1 AS BIGINT) AS dst FROM orders
        UNION ALL SELECT CAST(l_orderkey*8+1 AS BIGINT), CAST(l_partkey*8+2 AS BIGINT) FROM lineitem
        UNION ALL SELECT CAST(l_partkey*8+2 AS BIGINT), CAST(l_suppkey*8+3 AS BIGINT) FROM lineitem
        UNION ALL SELECT CAST(c_custkey*8+0 AS BIGINT), CAST(c_nationkey*8+4 AS BIGINT) FROM customer
        UNION ALL SELECT CAST(s_suppkey*8+3 AS BIGINT), CAST(s_nationkey*8+4 AS BIGINT) FROM supplier
        UNION ALL SELECT CAST(n_nationkey*8+4 AS BIGINT), CAST(n_regionkey*8+5 AS BIGINT) FROM nation
        UNION ALL SELECT CAST(l_suppkey*8+3 AS BIGINT), CAST(l_partkey*8+2 AS BIGINT)
          FROM lineitem WHERE l_orderkey % 7 = 0)""")
    con.execute("""
      CREATE TEMP TABLE dnodes AS SELECT DISTINCT node FROM (
        SELECT src AS node FROM de UNION ALL SELECT dst FROM de)""")
    con.execute("""
      CREATE TEMP TABLE ps AS
      SELECT src, dst FROM de WHERE src % 8 IN (2, 3) AND dst % 8 IN (2, 3)""")
    n_ps = con.execute("SELECT count(*) FROM ps").fetchone()[0]
    print(f"ps edges: {n_ps}", flush=True)

    con.execute("CREATE TEMP TABLE mutual_all (node BIGINT, mn BIGINT)")
    for k in range(copies):
        # copy membership by the shifted key range of the node's tag
        con.execute(f"""
          CREATE OR REPLACE TEMP TABLE ps_k AS
          SELECT src, dst FROM ps
          WHERE (CASE WHEN src % 8 = 2 THEN (src // 8) // {span_p}
                      ELSE (src // 8) // {span_s} END) = {k}""")
        nk = con.execute("SELECT count(*) FROM ps_k").fetchone()[0]
        # same sound in/out-core prefilter as g45Sql (2 rounds)
        con.execute("""
          CREATE OR REPLACE TEMP TABLE core2 AS
          WITH core1 AS (
            SELECT e.src, e.dst FROM ps_k e
            WHERE e.src IN (SELECT dst FROM ps_k) AND e.dst IN (SELECT src FROM ps_k))
          SELECT e.src, e.dst FROM core1 e
          WHERE e.src IN (SELECT dst FROM core1) AND e.dst IN (SELECT src FROM core1)""")
        con.execute("""
          INSERT INTO mutual_all
          WITH RECURSIVE reach(a, b) AS (
            SELECT src, dst FROM core2
            UNION
            SELECT r.a, e.dst FROM reach r JOIN core2 e ON r.b = e.src)
          SELECT r1.a AS node, min(r1.b) AS mn
          FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
          GROUP BY r1.a""")
        nm = con.execute("SELECT count(*) FROM mutual_all").fetchone()[0]
        print(f"copy {k}: ps_k={nk} mutual_total={nm}", flush=True)

    files = glob.glob(f"{spark_dir}/g45_scc/*.parquet")
    assert files, f"no spark output under {spark_dir}/g45_scc"
    flist = ", ".join(f"'{f}'" for f in files)
    bad = con.execute(f"""
      WITH oracle AS (
        SELECT n.node AS node_id,
               COALESCE(least(n.node, m.mn), n.node) AS scc_id
        FROM dnodes n LEFT JOIN mutual_all m ON n.node = m.node),
      spark AS (SELECT node_id, scc_id FROM read_parquet([{flist}])),
      d1 AS (SELECT * FROM spark EXCEPT SELECT * FROM oracle),
      d2 AS (SELECT * FROM oracle EXCEPT SELECT * FROM spark)
      SELECT (SELECT count(*) FROM d1), (SELECT count(*) FROM d2),
             (SELECT count(*) FROM spark), (SELECT count(*) FROM oracle)
    """).fetchone()
    s_only, o_only, n_s, n_o = bad
    ok = s_only == 0 and o_only == 0 and n_s == n_o
    print(f"rows spark={n_s} oracle={n_o} spark_only={s_only} oracle_only={o_only}")
    print(("PASS" if ok else "FAIL") + " g45_scc staged sf1 cross-check")
    sys.exit(0 if ok else 1)

if __name__ == "__main__":
    main()
