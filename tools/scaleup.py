#!/usr/bin/env python3
"""Tile a testdata scale-factor directory N x into a larger one.

Driver-side tooling (duckdb + pyarrow, like check.py) -- NOT part of
the library. Used for the sf1 scale trail: the driver ships
sf{0.001,0.01,0.1}; this tool tiles sf0.1 10x with consistent key
offsets so every foreign key stays intact inside its copy:

  - big tables get their primary key shifted by k * (max_key + 1) for
    copy k, and every FK column that references another TILED table is
    shifted by that table's span, so copy k joins only to copy k;
  - nation/region (the fixed 25/5-row dimensions) are NOT tiled --
    every copy's customers/suppliers still reference them, exactly the
    dimension-table shape a real 10x data growth has (and it makes the
    nation/region graph nodes 10x-degree hubs, which is the skew a
    scale trail SHOULD contain);
  - timestamps, text and embeddings are copied verbatim (so dedup
    operators see genuine 10x duplication -- also intentional);
  - each output parquet is cast back to the SOURCE arrow schema, so
    physical types survive (events.ts stays TIMESTAMP[ns] -- the type
    Tables.load's nanosAsLong path expects).

Usage: scaleup.py SRC_DIR DST_DIR COPIES
"""
import os
import sys

import duckdb
import pyarrow.parquet as pq

# table -> {column: span_source_table}; a column keyed to its own table
# is the primary key. Spans are max(key)+1 of the SOURCE table.
SHIFTS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part",
                 "l_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
VERBATIM = ["region", "nation"]
PK = {"customer": "c_custkey", "supplier": "s_suppkey", "part": "p_partkey",
      "orders": "o_orderkey", "events": "event_id", "documents": "doc_id",
      "embeddings": "vec_id", "lineitem": "l_orderkey"}


def main():
    src, dst, copies = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    spans = {}
    for t, k in PK.items():
        spans[t] = con.sql(
            f"SELECT max({k}) + 1 FROM '{src}/{t}.parquet'").fetchone()[0]
    spans["events_user"] = con.sql(
        f"SELECT max(user_id) + 1 FROM '{src}/events.parquet'").fetchone()[0]

    for t in VERBATIM:
        schema = pq.read_schema(f"{src}/{t}.parquet")
        tbl = con.sql(f"SELECT * FROM '{src}/{t}.parquet'").arrow()
        pq.write_table(tbl.cast(schema), f"{dst}/{t}.parquet")
        print(f"{t}: copied verbatim ({tbl.num_rows} rows)")

    for t, shifts in SHIFTS.items():
        schema = pq.read_schema(f"{src}/{t}.parquet")
        cols = [f.name for f in schema]
        parts = []
        for k in range(copies):
            sel = ", ".join(
                f"{c} + {k * spans[shifts[c]]} AS {c}" if c in shifts else c
                for c in cols)
            parts.append(f"SELECT {sel} FROM '{src}/{t}.parquet'")
        tbl = con.sql(" UNION ALL ".join(parts)).arrow()
        pq.write_table(tbl.cast(schema), f"{dst}/{t}.parquet")
        print(f"{t}: {tbl.num_rows} rows ({copies} copies)")


if __name__ == "__main__":
    main()
