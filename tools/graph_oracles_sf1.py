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
n_pass = n_fail = 0
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
    # CTE (all three START with it and its body ends in the first
    # "GROUP BY 1, 2),") and keep the rest. Guardrail: the stripped
    # prefix must actually BE the staged nation-graph CTE — validated
    # by content below, since the anchor itself is NOT unique (q186's
    # label-propagation rounds legitimately contain more of them); a
    # reformatted oracle would otherwise mis-split silently and run
    # with wrong semantics.
    anchor = "GROUP BY 1, 2),"
    def split_guard():
        if anchor not in sql:
            return f"staging anchor {anchor!r} not found"
        j = sql.index(anchor) + len(anchor)
        prefix = sql[:j]
        if not prefix.startswith("WITH e"):
            return (f"stripped prefix does not start with the e0/e CTE "
                    f"(got {prefix[:40]!r})")
        # exactly ONE CTE opener may precede the split — if the e0 CTE's
        # own GROUP BY were reformatted, the first anchor would sit in a
        # LATER CTE and the prefix would swallow it
        if prefix.count(" AS (") + prefix.count(" AS MATERIALIZED (") != 1:
            return "stripped prefix spans more than the e0/e CTE"
        for frag in ("o_custkey = c.c_custkey", "l_orderkey", "s_nationkey"):
            if frag not in prefix:
                return (f"stripped prefix missing {frag!r} — not the "
                        "staged nation-graph CTE")
        return None
    bad_split = split_guard()
    if bad_split:
        print(f"FAIL {q}: {bad_split} — refusing to mis-split; "
              "update graph_oracles_sf1.py")
        n_fail += 1
        continue
    j = sql.index(anchor) + len(anchor)
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
        n_fail += 1
        continue
    if len(got) != len(want):
        print(f"FAIL {q}: rows {len(got)} != {len(want)}")
        n_fail += 1
        continue
    gv = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    wv = want.sort_values(by=list(want.columns)).reset_index(drop=True)
    import pandas as pd
    bad = None
    for c in gv.columns:
        a, b = gv[c], wv[c]
        # Coerce both sides to a COMMON dtype explicitly. The old
        # astype(..., errors="ignore") is deprecated (removed in newer
        # pandas), and its silent no-op left dtype-mismatched columns
        # (int32 vs int64-as-object, decimal objects) comparing
        # unconverted — a spurious FAIL path (round-14 ADVICE).
        # The numeric path requires at least one side to ALREADY be a
        # numeric dtype: two TEXT columns compare as text even when
        # numeric-looking ("01" vs "1" must FAIL, not coerce equal);
        # the mixed case (int64 vs duckdb decimal-objects) is the one
        # the coercion exists for.
        an = pd.to_numeric(a, errors="coerce")
        bn = pd.to_numeric(b, errors="coerce")
        either_numeric = (pd.api.types.is_numeric_dtype(a)
                          or pd.api.types.is_numeric_dtype(b))
        if (either_numeric and an.notna().equals(a.notna())
                and bn.notna().equals(b.notna())):
            # both sides fully numeric-convertible: integers compare
            # EXACTLY in Int64 (a float64 detour would fuzz > 2^53 —
            # note an int column that arrived WITH nulls is already
            # float64 from the parquet/duckdb read, so >2^53 exactness
            # is only guaranteed for null-free integer columns; the
            # graph oracles emit counts and micro-longs well below)
            if (an.dropna() % 1 == 0).all() and (bn.dropna() % 1 == 0).all():
                a, b = an.astype("Int64"), bn.astype("Int64")
            else:
                a, b = an.astype("float64"), bn.astype("float64")
        else:
            # non-numeric (strings etc.) → compare canonical text
            a = a.astype("string")
            b = b.astype("string")
        eq = (a == b) | (pd.isna(a) & pd.isna(b))
        if not eq.all():
            i = eq.idxmin()
            bad = f"col {c} row {i}: {a[i]!r} != {b[i]!r}"
            break
    if bad:
        print(f"FAIL {q}: {bad}")
        n_fail += 1
    else:
        print(f"PASS {q} ({len(got)} rows)")
        n_pass += 1

print(f"\n{n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)
