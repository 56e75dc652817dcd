#!/usr/bin/env python3
"""Per-oracle DuckDB wall-clock budget guard.

Usage: python3 scripts/oracle_budget.py <sfDir> <oracleJson> [--budget SECS]

Runs EVERY oracle in the given oracle_sql.json against the sfDir views
under a per-query wall-clock cap (default 20 s) and exits non-zero if
any oracle breaches it. This is the standing pin behind round 9's
post-mortem: one pathological oracle (q232's exponentially-inlined CTE
chain) ran >55 CPU-minutes, hung the driver's checker, and zeroed the
whole round's correctness file. check.py now caps each oracle at
runtime; THIS script is the pre-flight that catches a slow oracle at
authoring time, before it ever reaches a checker.

Get an oracle_sql.json without dumping query results:
  sbt "runMain graft.Verify /root/testdata/sf0.001 /tmp/osql zzz"
(the non-matching filter skips every query but still writes the json).
"""
import json, sys, glob, os, threading, time
import duckdb

def run_capped(con, sql, secs):
    fired = [False]
    def kill():
        fired[0] = True
        con.interrupt()
    t = threading.Timer(secs, kill)
    t.start()
    t0 = time.time()
    try:
        con.sql(sql).fetchall()
    except Exception as e:
        if fired[0]:
            raise TimeoutError(f"exceeded {secs}s")
        raise
    finally:
        t.cancel()
    return time.time() - t0

def main(sf_dir, oracle_json, budget=20.0):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        con.execute(f"CREATE VIEW {os.path.basename(p)[:-8]} "
                    f"AS SELECT * FROM '{p}'")
    oracle = json.load(open(oracle_json))
    slow, failed = [], []
    for name in sorted(oracle):
        try:
            secs = run_capped(con, oracle[name], budget)
        except TimeoutError as e:
            print(f"  {name}: BUDGET BREACH {e}")
            failed.append(name)
            continue
        except Exception as e:
            print(f"  {name}: ERROR {e}")
            failed.append(name)
            continue
        if secs >= budget / 4:
            slow.append((name, secs))
        print(f"  {name}: {secs:.2f}s")
    if slow:
        print("WARN approaching budget (>= budget/4):")
        for n, s in slow:
            print(f"  {n}: {s:.2f}s")
    print(f"CHECKED {len(oracle)} BREACHED {len(failed)}")
    return 1 if failed else 0

if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    budget = 20.0
    for i, a in enumerate(sys.argv):
        if a == "--budget":
            budget = float(sys.argv[i + 1])
    sys.exit(main(args[0], args[1], budget))
