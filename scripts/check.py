#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [--timeout SECS]

Registers each testdata parquet as a DuckDB view named by table, runs every
oracle_sql.json entry, and compares with the Spark parquet result dumped by
graft.Verify: columns sorted by name, rows sorted by all columns, floats
compared with 1e-7 relative tolerance.

Every oracle runs under a wall-clock cap (default 120 s): a timer thread
calls con.interrupt(), the query raises, and the run records a per-query
TIMEOUT failure instead of hanging the whole sweep — one pathological
oracle (round 9's q232 exponential-CTE hang) can never again zero a
round's correctness file. Per-query oracle seconds are printed so slow
oracles surface before they become hangs.
"""
import json, math, sys, glob, os, threading, time
import duckdb

def canon(rows, cols):
    # rows as list of tuples in sorted-column order. Sort KEYS normalize
    # -0.0 to 0.0 AND carry the sign bit as a secondary component: eq is
    # sign-sensitive for zeros (the driver hashes string forms where
    # -0.0 != 0.0), so the sort must deterministically place -0.0 before
    # +0.0 — otherwise two multiset-equal results whose only difference
    # is the ORIGINAL order of a +0.0 row vs a -0.0 row could pair
    # +0.0 against -0.0 and report a false mismatch.
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    def skey(x):
        if isinstance(x, float):
            sign = 0.0 if math.isnan(x) else math.copysign(1.0, x)
            return (str(x + 0.0), sign)
        return (str(x), 0.0)
    out = [tuple(r[i] for i in idx) for r in rows]
    return sorted(cols), sorted(out, key=lambda r: tuple(skey(x) for x in r))

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

def run_capped(con, sql, secs):
    """Run sql with a wall-clock cap; returns (rows, cols, elapsed) or
    raises TimeoutError. The timer thread interrupts the connection."""
    fired = [False]
    def kill():
        fired[0] = True
        con.interrupt()
    t = threading.Timer(secs, kill)
    t.start()
    t0 = time.time()
    try:
        rel = con.sql(sql)
        rows, cols = rel.fetchall(), rel.columns
    except Exception:
        if fired[0]:
            raise TimeoutError(f"oracle exceeded {secs}s")
        raise
    finally:
        t.cancel()
    return rows, cols, time.time() - t0

def main(sf_dir, out_dir, timeout=120.0):
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
        try:
            wraw, wc, secs = run_capped(con, oracle[name], timeout)
        except TimeoutError as e:
            print(f"  {name}: TIMEOUT err=\"{e}\"")
            n_fail += 1
            continue
        except Exception as e:
            print(f"  {name}: ORACLE ERROR {e}")
            n_fail += 1
            continue
        wcols, wrows = canon(wraw, wc)
        tag = f" [{secs:.1f}s]" if secs >= 1.0 else ""
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
            print(f"  {name}: OK ({len(grows)} rows){tag}")
            n_pass += 1
    print(f"PASS {n_pass} FAIL {n_fail}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    tmo = 120.0
    for i, a in enumerate(sys.argv):
        if a == "--timeout":
            tmo = float(sys.argv[i + 1])
    sys.exit(main(args[0], args[1], tmo))
