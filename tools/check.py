#!/usr/bin/env python3
"""Local oracle harness (dev tool only — mimics the driver's correctness
gate). Usage:
  python3 tools/check.py [sfdir] [outdir] [query ...]
Runs DuckDB oracle SQL from outdir/oracle_sql.json against the sfdir
parquet tables, compares to the Verify parquet dumps: column names
(sorted), row counts, and values (sorted rows, float tolerance)."""
import sys, os, json, glob
import duckdb
import math

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = set(sys.argv[3:])

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for q, sql in sorted(oracle.items()):
    if only and q not in only:
        continue
    d = f"{outdir}/{q}"
    if not os.path.isdir(d):
        print(f"FAIL {q}: no spark output dir"); fails += 1; continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{d}/*.parquet')").fetchdf()
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {q}: {e}"); fails += 1; continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if [c.lower() for c in gc] != [c.lower() for c in ec]:
        print(f"FAIL {q}: columns {gc} vs {ec}"); fails += 1; continue
    got = got[gc].sort_values(gc, kind="mergesort").reset_index(drop=True)
    exp = exp[ec].sort_values(ec, kind="mergesort").reset_index(drop=True)
    if len(got) != len(exp):
        print(f"FAIL {q}: rows {len(got)} vs {len(exp)}"); fails += 1; continue
    bad = None
    for c in gc:
        for a, b in zip(got[c].tolist(), exp[c].tolist()):
            if a is None and b is None:
                continue
            if isinstance(a, float) or isinstance(b, float):
                an = a is None or (isinstance(a, float) and math.isnan(a))
                bn = b is None or (isinstance(b, float) and math.isnan(b))
                if an or bn:
                    if an != bn: bad = (c, a, b); break
                    continue
                if abs(a - b) > 1e-6 * max(1.0, abs(a), abs(b)):
                    bad = (c, a, b); break
            elif str(a) != str(b):
                bad = (c, a, b); break
        if bad: break
    if bad:
        print(f"FAIL {q}: col {bad[0]}: {bad[1]!r} != {bad[2]!r}"); fails += 1
    else:
        print(f"OK   {q} ({len(got)} rows)")
print(("ALL OK", f"{fails} FAILURES")[fails > 0])
sys.exit(1 if fails else 0)
