#!/usr/bin/env python3
"""Time every DuckDB oracle query at a scale factor, for comparison
with graft.Bench per-query times (same SQL the correctness gate runs).

Usage: python3 scripts/duck_bench.py SFDIR ORACLE_SQL_JSON [--passes N]
  ORACLE_SQL_JSON is the oracle_sql.json a Verify run dumps.

Prints one line per query (min over N passes, default 2 — same
steady-state protocol as graft.Bench) and a total.
"""
import json, sys, time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sfdir, oracle_path = sys.argv[1], sys.argv[2]
    passes = 2
    if "--passes" in sys.argv:
        passes = int(sys.argv[sys.argv.index("--passes") + 1])
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(oracle_path))
    total = 0.0
    for name in sorted(oracle):
        best = None
        for _ in range(passes):
            t0 = time.perf_counter()
            try:
                con.execute(oracle[name]).fetchall()
            except Exception as e:
                print(f"{name}\tERROR\t{e}")
                best = None
                break
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        if best is not None:
            total += best
            print(f"{name}\t{best:.3f}")
    print(f"TOTAL\t{total:.3f}\t({len(oracle)} queries, min of {passes})")


if __name__ == "__main__":
    main()
