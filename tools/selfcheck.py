#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare Verify output
parquet against DuckDB running SparkEntry.oracleSql on the same testdata.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify everything for a stable compare (mirrors sort+hash)
    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            return f"{v:.10g}"
        return str(v)
    s = df.applymap(cell)
    return s.sort_values(by=list(s.columns)).reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name} (no spark output)"); fail += 1; continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
            want = con.sql(sql).df()
        except Exception as e:
            print(f"ERROR    {name}: {e}"); fail += 1; continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"SCHEMA   {name}: spark={list(g.columns)} duck={list(w.columns)}")
            fail += 1; continue
        if len(g) != len(w):
            print(f"ROWS     {name}: spark={len(g)} duck={len(w)}"); fail += 1; continue
        if not g.equals(w):
            diff = (g != w).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"VALUES   {name}: first diffs:")
            for i in idx:
                print(f"  spark: {g.loc[i].to_dict()}")
                print(f"  duck : {w.loc[i].to_dict()}")
            fail += 1; continue
        ok += 1
        print(f"OK       {name} ({len(g)} rows)")
    # queries without oracle → rows-only
    import os
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name in oracle: continue
        files = glob.glob(f"{d}/*.parquet")
        n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
        print(f"{'ROWSOK' if n > 0 else 'ROWS0 '}   {name} ({n} rows, no oracle)")
        if n == 0: fail += 1
    print(f"\n{ok} oracle-OK, {fail} failures")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
