#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: compare_oracle.py <verify_out_dir> <sf_dir> [timeout_secs] [only_csv]

Loads each <name>/ parquet result written by graft.Verify, runs the
corresponding oracle SQL from oracle_sql.json in DuckDB over the sf_dir
tables, and compares (schema by sorted column names, values exactly,
rows as sorted tuples). An oracle running past timeout_secs (0 = no
limit) is interrupted and reported ORACLE_TIMEOUT — at sf0.1 the
all-pairs oracles are DuckDB-quadratic; the engine side is seconds.
only_csv restricts the run to a comma-separated name list.
"""
import sys, os, json, glob, math, threading
import duckdb

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return repr(v)

def table_of(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    return sorted(out), [cols[i] for i in order]

def main():
    vdir, sfdir = sys.argv[1], sys.argv[2]
    timeout = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    oracles = json.load(open(os.path.join(vdir, "oracle_sql.json")))
    con = duckdb.connect()
    for tbl in ["region","nation","customer","supplier","part","orders",
                "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{sfdir}/{tbl}.parquet'")
    results = {}
    names = sorted(d for d in os.listdir(vdir) if os.path.isdir(os.path.join(vdir, d)))
    if only is not None:
        names = [n for n in names if n in only]
    for name in names:
        files = glob.glob(os.path.join(vdir, name, "*.parquet"))
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        got = con.sql(f"SELECT * FROM '{os.path.join(vdir, name)}/*.parquet'")
        grow, gcols = table_of(got.fetchall(), got.columns)
        if name not in oracles:
            results[name] = f"ROWS_ONLY rows={len(grow)}" + (" EMPTY!" if not grow else "")
            continue
        timer = threading.Timer(timeout, con.interrupt) if timeout > 0 else None
        try:
            if timer: timer.start()
            want = con.sql(oracles[name])
            wrow, wcols = table_of(want.fetchall(), want.columns)
        except duckdb.InterruptException:
            results[name] = "ORACLE_TIMEOUT"
            continue
        except Exception as e:
            results[name] = f"ORACLE_ERROR {e}"
            continue
        finally:
            if timer: timer.cancel()
        if gcols != wcols:
            results[name] = f"SCHEMA_MISMATCH spark={gcols} duck={wcols}"
        elif len(grow) != len(wrow):
            results[name] = f"ROWCOUNT {len(grow)} vs {len(wrow)}"
        elif grow != wrow:
            bad = [i for i, (a, b) in enumerate(zip(grow, wrow)) if a != b]
            i = bad[0]
            results[name] = (f"VALUE_MISMATCH {len(bad)}/{len(grow)} rows; first@{i}:\n"
                             f"    spark={grow[i]}\n    duck ={wrow[i]}")
        else:
            results[name] = f"OK rows={len(grow)}" + (" (EMPTY!)" if not grow else "")
    width = max(len(n) for n in results)
    npass = sum(1 for v in results.values() if v.startswith("OK"))
    for name, v in results.items():
        print(f"{name:<{width}}  {v}")
    print(f"\n{npass}/{len([n for n in names if n in oracles])} oracle-checked pass")

if __name__ == "__main__":
    main()
