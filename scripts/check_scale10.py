#!/usr/bin/env python3
"""10x-scale DuckDB oracle compare (VERDICT r11 #3): same gate as
check.py (schema, rowcount, exact values) over the deterministic 10x
fixtures, but writes a CORRECTNESS-style sidecar so the judge can read
rows/schema/hash per flagship at 10x.

Usage: python3 scripts/check_scale10.py <fixtureDir> <verifyOutDir> \
           [--timeout SECS] [--out correctness_scale10.json]

Run after: sbt "runMain graft.VerifyScale10"  (generates fixtures and
dumps the flagship results + oracle_sql.json).
"""
import json, glob, os, sys
import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check import canon, eq, run_capped  # same gate logic, one source


def main(sf_dir, out_dir, timeout, out_path):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-8]
        # Spark writes each table as a DIRECTORY of part files
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    report = {}
    n_pass = n_fail = 0
    for qdir in sorted(glob.glob(f"{out_dir}/q*")):
        name = os.path.basename(qdir)
        entry = {"rows_match": False, "schema_match": False,
                 "hash_match": False, "rows": None, "oracle_secs": None}
        report[name] = entry
        got = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        gcols, grows = canon(got.fetchall(), got.columns)
        entry["rows"] = len(grows)
        if name not in oracle:
            entry["error"] = "no oracle"
            n_fail += 1
            continue
        try:
            wraw, wc, secs = run_capped(con, oracle[name], timeout)
        except Exception as e:
            entry["error"] = f"oracle: {type(e).__name__}: {e}"
            print(f"  {name}: ORACLE ERROR {e}")
            n_fail += 1
            continue
        entry["oracle_secs"] = round(secs, 1)
        wcols, wrows = canon(wraw, wc)
        entry["schema_match"] = gcols == list(wcols)
        entry["rows_match"] = len(grows) == len(wrows)
        if entry["schema_match"] and entry["rows_match"]:
            entry["hash_match"] = all(
                all(eq(a, b) for a, b in zip(g, w))
                for g, w in zip(grows, wrows))
        ok = entry["schema_match"] and entry["rows_match"] and entry["hash_match"]
        n_pass += ok
        n_fail += not ok
        print(f"  {name}: {'OK' if ok else 'FAIL'} "
              f"({len(grows)} rows) [{secs:.1f}s oracle]")
    with open(out_path, "w") as f:
        json.dump({"sf": "10x_sf0.1_synthetic", "fixture_dir": sf_dir,
                   "queries": report}, f, indent=1)
    print(f"PASS {n_pass} FAIL {n_fail} -> {out_path}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    tmo, out = 900.0, "correctness_scale10.json"
    for i, a in enumerate(sys.argv):
        if a == "--timeout":
            tmo = float(sys.argv[i + 1])
        if a == "--out":
            out = sys.argv[i + 1]
    sys.exit(main(args[0], args[1], tmo, out))
