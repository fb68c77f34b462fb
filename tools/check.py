#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run Verify's parquet
outputs against DuckDB oracle SQL on the same sf dir and diff values.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb

def main(sf_dir, out_dir):
    con = duckdb.connect()
    # at the 10x (sf1) corpus DuckDB's row estimates on globbed part
    # files run ~10x low, so it builds hash tables on the 60M-row side:
    # unbounded memory OOM-kills the process, and the default cwd-
    # relative ".tmp" spill can fill the root disk. Cap memory and
    # point the spill somewhere disposable (overridable via env).
    con.execute("SET memory_limit='%s'"
                % os.environ.get("CHECK_MEM", "60GB"))
    con.execute("SET temp_directory='%s'"
                % os.environ.get("CHECK_TMP", out_dir + "/.ducktmp"))
    con.execute("SET preserve_insertion_order=false")
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        # Spark-written tables are DIRECTORIES of part files (the 10x
        # scale corpus); the driver's testdata is single files
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only is not None and name not in only:
            continue
        sql = oracle[name]
        res_dir = f"{out_dir}/{name}"
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no verify output")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:300]}")
            n_fail += 1
            continue
        # driver compares columns sorted by name, then hashes values
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        gv = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        wv = want.sort_values(by=list(want.columns)).reset_index(drop=True)
        mismatch = None
        for c in gv.columns:
            a, b = gv[c], wv[c].astype(gv[c].dtype, errors="ignore") \
                if hasattr(wv[c], "astype") else wv[c]
            try:
                import pandas as pd
                eq = (a == b) | (pd.isna(a) & pd.isna(b))
                if not eq.all():
                    i = eq.idxmin()
                    mismatch = f"col {c} row {i}: {a[i]!r} != {b[i]!r}"
                    break
            except Exception as e:
                mismatch = f"col {c}: compare error {e}"
                break
        if mismatch:
            print(f"FAIL {name}: {mismatch}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    # rows-only queries (no oracle)
    for res_dir in sorted(glob.glob(f"{out_dir}/q*")):
        name = os.path.basename(res_dir)
        if name in oracle or not os.path.isdir(res_dir):
            continue
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{res_dir}/*.parquet')").fetchone()[0]
        print(f"ROWS {name}: {n}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
