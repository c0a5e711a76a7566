#!/usr/bin/env python3
"""Local correctness loop: compare Verify output parquet vs DuckDB oracle.

Usage: python3 tools/check.py <sfdir> <outdir> [query ...]
Mimics the driver's t2 gate: per query, run oracle SQL in DuckDB over the
raw tables, load the Spark result parquet, sort both by all columns
(named-sorted), compare row count, schema-ish, and values.
"""
import sys, json, glob, math
import duckdb
import pandas as pd

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def cmp_vals(a, b):
    if a is None and b is None: return True
    if pd.isna(a) and pd.isna(b): return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb): return True
        return fa == fb  # exact: our determinism contract
    return str(a) == str(b)

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # Bound the oracle engine: several graph/dedup oracles at sf1+
    # allocate 50-60 GB and an unbounded instance gets OOM-killed
    # mid-sweep (measured); a limit makes them spill to disk instead.
    # Overridable for small hosts via CHECK_MEM_LIMIT.
    import os
    def default_mem_limit():
        # min(48GB, ~75% of physical RAM): a hard-coded 48GB on a
        # smaller host exceeds physical RAM and protects nothing.
        try:
            phys = os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
            return f"{min(48, max(1, int(phys * 0.75 / 2**30)))}GB"
        except (ValueError, OSError):
            return "48GB"
    con.execute(f"SET memory_limit='{os.environ.get('CHECK_MEM_LIMIT', default_mem_limit())}'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    # Per-query oracle wall-clock budget. An oracle that exceeds it is
    # reported ORACLE-RESOURCE (a DuckDB resource question), NEVER as
    # an engine failure — the round-10 sweep lesson where an OOM-killed
    # checker masqueraded as 4 unverified queries.
    timeout_s = int(os.environ.get("CHECK_TIMEOUT_S", "1800"))
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        if only and name not in only: continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            results[name] = "MISSING-SPARK-OUTPUT"; continue
        try:
            spark_df = norm(pd.concat([pd.read_parquet(f) for f in files]))
        except Exception as e:
            results[name] = f"SPARK-READ-ERR {e}"; continue
        import threading
        # done-flag guards the timer race: if the Timer fires in the
        # window between query completion and timer.cancel(), a bare
        # con.interrupt() would latch and abort the NEXT query,
        # misreporting a healthy fast query as ORACLE-RESOURCE.
        done = threading.Event()
        fired = threading.Event()

        def _interrupt():
            fired.set()
            if not done.is_set():
                con.interrupt()
        timer = threading.Timer(timeout_s, _interrupt)
        timer.start()
        try:
            duck_df = norm(con.execute(sql).fetchdf())
        except Exception as e:
            en = type(e).__name__
            # Resource exhaustion on the ORACLE side (OOM at the
            # memory_limit, interrupt at the timeout) is a distinct
            # state from a value mismatch: it says nothing about the
            # engine. Report it as such so it can be retried at a
            # lower scale / higher limit instead of reading as FAIL.
            if en in ("OutOfMemoryException", "InterruptException") \
                    or "Out of Memory" in str(e) or "INTERRUPT" in str(e).upper():
                results[name] = f"ORACLE-RESOURCE {en}: {e}"
            else:
                results[name] = f"ORACLE-ERR {en}: {e}"
            continue
        finally:
            done.set()
            timer.cancel()
            # join closes the remaining race window: a timer thread
            # already past its done-check can still be in flight and
            # call con.interrupt() AFTER the drain below — joining
            # (returns immediately if the timer never started) makes
            # the fired flag authoritative and guarantees the drain
            # runs after any interrupt has been issued.
            timer.join()
            if fired.is_set():
                # the timer ran concurrently with completion: an
                # interrupt may have latched after the query finished —
                # drain it on a throwaway statement so it cannot abort
                # the NEXT query in the loop
                try:
                    con.execute("SELECT 1")
                except Exception:
                    pass
        if list(spark_df.columns) != list(duck_df.columns):
            results[name] = f"COLS spark={list(spark_df.columns)} duck={list(duck_df.columns)}"; continue
        # Type-strict gate: the driver hashes typed values, so an int column
        # on one side vs float on the other (DuckDB HUGEINT fetched as
        # float64 — the m1/t6 bug class) must FAIL here even when the
        # values compare equal numerically.
        tbad = None
        for c in spark_df.columns:
            ka, kb = spark_df[c].dtype.kind, duck_df[c].dtype.kind
            ints, floats = set("iu"), set("f")
            if (ka in ints and kb in floats) or (ka in floats and kb in ints):
                tbad = f"DTYPE col {c}: spark={spark_df[c].dtype} duck={duck_df[c].dtype} (int-vs-float — cast the oracle)"
                break
        if tbad:
            results[name] = tbad; continue
        if len(spark_df) != len(duck_df):
            results[name] = f"ROWS spark={len(spark_df)} duck={len(duck_df)}"; continue
        # Vectorized per-column compare with the same semantics as
        # cmp_vals (exact float equality, NaN==NaN, str() otherwise):
        # the per-cell iloc loop was O(rows*cols) python — a full sf1
        # sweep spent dozens of CPU-minutes in it.
        bad = None
        for c in spark_df.columns:
            a, b = spark_df[c], duck_df[c]
            if len(a) == 0: continue
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                eq = (a.astype(float).values == b.astype(float).values) \
                    | (a.isna().values & b.isna().values)
            else:
                eq = (a.astype(str).values == b.astype(str).values) \
                    | (a.isna().values & b.isna().values)
            if not eq.all():
                i = int((~eq).argmax())
                av, bv = spark_df.iloc[i][c], duck_df.iloc[i][c]
                if not cmp_vals(av, bv):  # confirm via the reference rule
                    bad = f"VAL row{i} col {c}: spark={av!r} duck={bv!r}"
                    break
        results[name] = bad or f"OK ({len(spark_df)} rows)"
        print("done " + name + ": " + results[name], file=sys.stderr, flush=True)
    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    n_res = sum(1 for v in results.values() if v.startswith("ORACLE-RESOURCE"))
    for k, v in sorted(results.items()):
        tag = "PASS " if v.startswith("OK") else \
            ("ORACLE-RESOURCE " if v.startswith("ORACLE-RESOURCE") else "FAIL ")
        print(tag + k + ": " + v)
    print(f"== {n_ok}/{len(results)} pass"
          + (f" ({n_res} oracle-resource, not engine failures)" if n_res else ""))

if __name__ == "__main__":
    main()
