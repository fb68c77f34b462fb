#!/usr/bin/env python3
"""sf1 (10x) runner for the three nation-graph oracles
(q126_triangle_count, q186_label_propagation, q252_hits).

At the sf1 corpus DuckDB's row estimates on globbed part files run
~10x low, so the single-statement oracles build the 4-way-join hash
table on the 60M-row lineitem side: observed 130 GB RSS (OOM kill) /
80 GB disk spill. Temp tables carry exact counts, so staging the
shared nation-graph aggregate (the oracles' `e0` / `e` CTE) with an
explicit join order makes the whole thing run in under a second —
build-side choice is the entire difference. Semantics are
byte-identical to the CTE text; the driver's sf0.01 gate runs the
unstaged single-statement oracles unchanged.

Usage: python3 tools/graph_oracles_sf1.py <sfDir> <verifyOutDir> <q1> [q2 ...]
Writes each oracle result to /tmp/<q>_oracle.parquet; compare against
<verifyOutDir>/<q>/*.parquet with the check.py column-sorted compare.
"""
import duckdb, json, glob, os, sys, time

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
con.execute("SET memory_limit='%s'" % os.environ.get("CHECK_MEM", "60GB"))
con.execute("SET temp_directory='%s'" % (out_dir + "/.ducktmp"))
con.execute("SET preserve_insertion_order=false")
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
o = json.load(open(f"{out_dir}/oracle_sql.json"))

t0 = time.time()
con.execute("""CREATE TEMP TABLE t_oc AS
  SELECT o.o_orderkey AS ok, c.c_nationkey AS src
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey""")
# identical text to the oracles' e0/e CTE body, staged
con.execute("""CREATE TEMP TABLE e0 AS
  SELECT t.src, s.s_nationkey AS dst, COUNT(*) AS w
  FROM lineitem l JOIN t_oc t ON l.l_orderkey = t.ok
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2""")
con.execute("CREATE TEMP VIEW e AS SELECT * FROM e0")
print("e0 staged in", round(time.time() - t0, 1), "s:",
      con.execute("SELECT COUNT(*), SUM(w) FROM e0").fetchall(), flush=True)

for q in sys.argv[3:]:
    sql = o[q]
    # drop the leading `WITH e0 AS (...)` / `WITH e AS MATERIALIZED (...)`
    # CTE (all three end in the same "GROUP BY 1, 2),") and keep the rest.
    # Guardrails: the split anchor must be UNIQUE in the oracle text and
    # the stripped prefix must actually be the nation-graph CTE we stage
    # above — a reformatted oracle or an earlier matching substring would
    # otherwise mis-split silently and run with wrong semantics.
    anchor = "GROUP BY 1, 2),"
    if sql.count(anchor) != 1:
        sys.exit(f"{q}: expected exactly one {anchor!r} in the oracle "
                 f"(found {sql.count(anchor)}) — staging anchor is stale, "
                 "update graph_oracles_sf1.py")
    j = sql.index(anchor) + len(anchor)
    prefix = sql[:j]
    if not prefix.startswith("WITH e"):
        sys.exit(f"{q}: stripped prefix does not start with the e0/e CTE "
                 f"(got {prefix[:40]!r}) — staging anchor is stale")
    for frag in ("o_custkey = c.c_custkey", "l_orderkey",
                 "s_nationkey", anchor):
        if frag not in prefix:
            sys.exit(f"{q}: stripped prefix missing {frag!r} — it is not "
                     "the staged nation-graph CTE, refusing to mis-split")
    staged = "WITH " + sql[j:].lstrip()
    t0 = time.time()
    df = con.execute(staged).fetchdf()
    print(q, "rows:", len(df), "in", round(time.time() - t0, 1), "s",
          flush=True)
    df.to_parquet(f"/tmp/{q}_oracle.parquet")
    # compare against the Verify output with check.py's column-sorted
    # value compare, so the staged gate is PASS/FAIL in one command
    got = con.execute(
        f"SELECT * FROM read_parquet('{out_dir}/{q}/*.parquet')").fetchdf()
    want = df
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        print(f"FAIL {q}: columns {list(got.columns)} != {list(want.columns)}")
        continue
    if len(got) != len(want):
        print(f"FAIL {q}: rows {len(got)} != {len(want)}")
        continue
    gv = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    wv = want.sort_values(by=list(want.columns)).reset_index(drop=True)
    import pandas as pd
    bad = None
    for c in gv.columns:
        a, b = gv[c], wv[c]
        try:
            b = b.astype(a.dtype, errors="ignore")
        except Exception:
            pass
        eq = (a == b) | (pd.isna(a) & pd.isna(b))
        if not eq.all():
            i = eq.idxmin()
            bad = f"col {c} row {i}: {a[i]!r} != {b[i]!r}"
            break
    print(f"FAIL {q}: {bad}" if bad else f"PASS {q} ({len(got)} rows)")
