#!/usr/bin/env python3
"""Determinism audit (round-12 verdict task 7): hash-compare two Verify
output trees query by query.

Usage:
  python3 tools/determinism.py <dirA> <dirB>

Each dir is a Verify outDir (one parquet dir per query). For every query
present in both trees, both outputs are loaded, rows are sorted by every
column, and the two frames must be byte-identical (exact float equality
— the determinism claim is bitwise, not approximate). ORACLED queries
are compared on EVERY column (their outputs are deterministic by
contract — event-gap `_us` columns are data, not timings); only the
rows-only queries (no entry in oracle_sql.json) get their wall-clock
columns dropped, since those are non-deterministic BY DESIGN and are
exactly why the query is rows-only.

Covers both audit axes:
  same-JVM:   SPARK_GRAFT_REPEAT=1 Verify writes <out>/__repeat__/ —
              compare <out> against <out>/__repeat__
  cross-JVM:  run Verify twice into two dirs and compare them.
"""
import sys
import re
import duckdb

# wall-clock / rate columns: non-deterministic by design, named with
# these suffixes throughout the engine (FIXTURES.md §B column contract)
TIMING = re.compile(
    r"(_ms$|_us$|_ns$|_sec$|_secs$|_time$|^time_|_time_|_per_sec$|throughput)")


def frame(con, path, name, oracled):
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM parquet_scan('{path}/{name}/*.parquet')"
    ).fetchall()]
    keep = cols if oracled else [c for c in cols if not TIMING.search(c)]
    dropped = sorted(set(cols) - set(keep))
    if not keep:
        # every column is a timing column (possible for a rows-only
        # bench harness query): compare row counts only instead of
        # emitting "SELECT  FROM ..." — a syntax error that would abort
        # the whole audit (ADVICE r12)
        rows = con.execute(
            f"SELECT count(*) FROM parquet_scan('{path}/{name}/*.parquet')"
        ).fetchall()
        return ["__rowcount_only__"], dropped, rows
    sel = ", ".join(f'"{c}"' for c in keep)
    order = ", ".join(f'"{c}"' for c in keep)
    rows = con.execute(
        f"SELECT {sel} FROM parquet_scan('{path}/{name}/*.parquet') ORDER BY {order}"
    ).fetchall()
    return keep, dropped, rows


def main():
    a, b = sys.argv[1], sys.argv[2]
    import os
    import json
    names = sorted(
        d for d in os.listdir(a)
        if d not in ("oracle_sql.json", "__repeat__")
        and os.path.isdir(os.path.join(a, d))
        and os.path.isdir(os.path.join(b, d)))
    oracle_path = os.path.join(a, "oracle_sql.json")
    oracled = set()
    if os.path.exists(oracle_path):
        with open(oracle_path) as f:
            oracled = set(json.load(f))
    con = duckdb.connect()
    diffs, timing_dropped = [], {}
    for name in names:
        ka, da, ra = frame(con, a, name, name in oracled)
        kb, db, rb = frame(con, b, name, name in oracled)
        if da:
            timing_dropped[name] = da
        if ka != kb:
            diffs.append(f"{name}: column sets differ: {ka} vs {kb}")
        elif ra != rb:
            nd = sum(1 for x, y in zip(ra, rb) if x != y) + abs(len(ra) - len(rb))
            diffs.append(f"{name}: {nd} differing rows (of {len(ra)}/{len(rb)})")
    print(f"compared={len(names)} identical={len(names) - len(diffs)} "
          f"diffs={len(diffs)} timing_cols_excluded={len(timing_dropped)}")
    for name, cols in sorted(timing_dropped.items()):
        print(f"  [timing-excluded] {name}: {', '.join(cols)}")
    for d in diffs:
        print(f"  [DIFF] {d}")
    sys.exit(1 if diffs else 0)


if __name__ == "__main__":
    main()
