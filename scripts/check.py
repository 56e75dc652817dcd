#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Registers each testdata parquet as a DuckDB view named by table, runs every
oracle_sql.json entry, and compares with the Spark parquet result dumped by
graft.Verify: columns sorted by name, rows sorted by all columns, floats
compared with 1e-7 relative tolerance.
"""
import json, math, sys, glob, os
import duckdb

def canon(rows, cols):
    # rows as list of tuples in sorted-column order. Sort KEYS normalize
    # -0.0 to 0.0 (so rows that differ only in zero sign still align and
    # reach eq, which then flags the sign diff like the driver's string
    # hash does); the stored VALUES keep their sign bit.
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    def norm(x):
        return x + 0.0 if isinstance(x, float) else x
    out = [tuple(r[i] for i in idx) for r in rows]
    return sorted(cols), sorted(out, key=lambda r: tuple(str(norm(x)) for x in r))

def eq(a, b):
    # EXACT compare — mirrors the driver's hash gate (no float tolerance).
    # A query that needs tolerance must round on BOTH sides in SQL/Spark.
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        # the driver hashes string forms, where -0.0 != 0.0 — the r8 q197
        # red was exactly this (DuckDB round() keeps IEEE -0.0, Spark's
        # BigDecimal round() doesn't); compare sign bits, not just ==
        if a == 0.0 and b == 0.0:
            return math.copysign(1.0, a) == math.copysign(1.0, b)
        return a == b
    if a is None or b is None:
        return False
    return str(a) == str(b)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for qdir in sorted(glob.glob(f"{out_dir}/q*")):
        name = os.path.basename(qdir)
        got = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        gcols, grows = canon(got.fetchall(), got.columns)
        if name not in oracle:
            print(f"  {name}: NOORACLE rows={len(grows)}")
            continue
        want = con.sql(oracle[name])
        wcols, wrows = canon(want.fetchall(), want.columns)
        if gcols != [c for c in wcols]:
            print(f"  {name}: SCHEMA MISMATCH got={gcols} want={wcols}")
            n_fail += 1
            continue
        # type-width audit (a strict driver compare may check dtypes too)
        gtypes = {r[0]: r[1] for r in con.sql(
            f"DESCRIBE SELECT * FROM '{qdir}/*.parquet'").fetchall()}
        wtypes = {r[0]: r[1] for r in con.sql("DESCRIBE " + oracle[name]).fetchall()}
        tmis = [c for c in gtypes if gtypes.get(c) != wtypes.get(c)]
        if tmis:
            print(f"  {name}: TYPE MISMATCH {[(c, gtypes[c], wtypes.get(c)) for c in tmis]}")
            n_fail += 1
            continue
        if len(grows) != len(wrows):
            print(f"  {name}: ROWCOUNT got={len(grows)} want={len(wrows)}")
            n_fail += 1
            continue
        bad = None
        for i, (g, w) in enumerate(zip(grows, wrows)):
            if not all(eq(a, b) for a, b in zip(g, w)):
                bad = (i, g, w)
                break
        if bad:
            print(f"  {name}: VALUE MISMATCH row {bad[0]}\n    got  {bad[1]}\n    want {bad[2]}")
            n_fail += 1
        else:
            print(f"  {name}: OK ({len(grows)} rows)")
            n_pass += 1
    print(f"PASS {n_pass} FAIL {n_fail}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
