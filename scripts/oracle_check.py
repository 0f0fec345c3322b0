#!/usr/bin/env python3
"""Local pre-check of SparkEntry queries vs the DuckDB oracle.

Mimics the driver's compare: for each query dir under OUTDIR, load the
Spark-written parquet and run the matching oracle SQL from
oracle_sql.json in DuckDB (tables = views over the sfDir parquet
files), sort columns by name, then compare row-by-row values.

Usage: python3 scripts/oracle_check.py SFDIR OUTDIR [query ...]
"""
import json, math, os, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # match driver-ish value hashing: repr of rounded float
        return repr(round(v, 9))
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return repr(v)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    n_pass = n_fail = n_skip = 0
    for name in names:
        if only and name not in only:
            continue
        spark_df = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
        if name not in oracle:
            print(f"SKIP  {name}: no oracle ({len(spark_df)} rows)")
            n_skip += 1
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        scols, dcols = sorted(spark_df.columns), sorted(duck_df.columns)
        if scols != dcols:
            print(f"FAIL  {name}: columns differ spark={scols} duck={dcols}")
            n_fail += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL  {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
            n_fail += 1
            continue
        srows = [tuple(norm(v) for v in r) for r in spark_df[scols].itertuples(index=False)]
        drows = [tuple(norm(v) for v in r) for r in duck_df[dcols].itertuples(index=False)]
        if srows != drows:
            bad = next(i for i, (a, b) in enumerate(zip(srows, drows)) if a != b)
            print(f"FAIL  {name}: first diff at row {bad}:")
            print(f"      spark: {srows[bad]}")
            print(f"      duck : {drows[bad]}")
            n_fail += 1
            continue
        print(f"PASS  {name} ({len(spark_df)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} no-oracle ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
