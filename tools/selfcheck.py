#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare Verify output
parquet against DuckDB running SparkEntry.oracleSql on the same testdata.

Strictness note (round 6): the driver's hash renders cells per-dtype — an
int64 103 and a float64 103.0 hash DIFFERENTLY. Round 5 shipped four oracle
twins whose DuckDB window-sums produced HUGEINT (→ float64 in pandas) while
Spark produced BIGINT; the old selfcheck's %.10g stringification coerced both
to "103" and masked the failure. This version classifies every column's dtype
(int / float / decimal / bool / string) on BOTH sides and fails on a numeric
dtype-class mismatch before comparing values, so that bug class is locally
visible. Value compare stays %.10g for genuinely-float columns on both sides.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def dtype_class(s: pd.Series) -> str:
    """Coarse dtype class, mirroring how the driver's hash renders cells."""
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_object_dtype(s):
        kinds = {type(v).__name__ for v in s.dropna()}
        if kinds <= {"int"}:
            return "int"
        if kinds <= {"float"}:
            return "float"
        if kinds <= {"Decimal"}:
            return "decimal"
        if kinds <= {"bool", "bool_"}:
            return "bool"
        return "object"
    return "other"

NUMERIC = {"int", "float", "decimal"}

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    classes = {c: dtype_class(df[c]) for c in df.columns}
    def cell(v, cls):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if cls == "int":
            return str(int(v))          # never a decimal point
        if cls == "float":
            return f"{float(v):.10g}"   # tolerant float render
        return str(v)
    out = pd.DataFrame({c: df[c].map(lambda v, k=classes[c]: cell(v, k))
                        for c in df.columns})
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)

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
        if sorted(got.columns) != sorted(want.columns):
            print(f"SCHEMA   {name}: spark={sorted(got.columns)} duck={sorted(want.columns)}")
            fail += 1; continue
        # dtype-class gate: a numeric class mismatch (e.g. Spark BIGINT vs
        # DuckDB HUGEINT→float64) renders differently under the driver's hash
        # even when values are numerically identical — fail it here.
        bad = []
        for c in sorted(got.columns):
            gc, wc = dtype_class(got[c]), dtype_class(want[c])
            if gc != wc and (gc in NUMERIC or wc in NUMERIC):
                bad.append((c, gc, wc))
        if bad:
            for c, gc, wc in bad:
                print(f"DTYPE    {name}.{c}: spark={gc} duck={wc} "
                      f"(driver hash renders these differently — cast the oracle)")
            fail += 1; continue
        g, w = norm(got), norm(want)
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
    rows_only = 0
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name in oracle: continue
        rows_only += 1
        files = glob.glob(f"{d}/*.parquet")
        n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
        print(f"{'ROWSOK' if n > 0 else 'ROWS0 '}   {name} ({n} rows, no oracle)")
        if n == 0: fail += 1
    # mechanical registry census — the doc-of-record counts (COVERAGE.md
    # banner, PLANS.md appendix) quote THIS line, not hand-kept tallies
    print(f"\nregistered={len(glob.glob(out_dir + '/*/'))} "
          f"oracled={ok} rows_only={rows_only}")
    print(f"{ok} oracle-OK, {fail} failures")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
