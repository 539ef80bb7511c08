#!/usr/bin/env python3
"""Local oracle harness (dev tool only — mimics the driver's correctness
gate). Usage:
  python3 tools/check.py [--tolerant] [sfdir] [outdir] [query ...]
Runs DuckDB oracle SQL from outdir/oracle_sql.json against the sfdir
parquet tables, compares to the Verify parquet dumps: column names
(sorted), row counts, and values.

STRICT mode (the default, added round 13 after the q203 episode — the
driver's comparator is a hash of canonical values, so a locally-green
tolerant compare can still ship red):
  - non-float columns compare EXACTLY (type-aware, no str() escape:
    1 vs True vs Decimal(1) are all mismatches);
  - float columns compare by repr (bit-exact up to repr round-trip),
    NaN==NaN; no tolerance;
  - any decimal.Decimal-valued output column is flagged loudly — the
    canonical text of a DECIMAL differs between engines' hashers, so a
    gate should never emit one (cast to BIGINT/DOUBLE at the boundary).
--tolerant restores the old 1e-6-relative float compare for quick
triage of genuinely-float pipelines under development."""
import sys, os, json, glob
import duckdb
import math
import decimal

args = [a for a in sys.argv[1:] if a != "--tolerant"]
strict = "--tolerant" not in sys.argv[1:]
sfdir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
outdir = args[1] if len(args) > 1 else "/tmp/verify_out"
only = set(args[2:])

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")


def is_nanish(x):
    if x is None or (isinstance(x, float) and math.isnan(x)):
        return True
    # pandas NaT (and any NaN-like scalar) is the unique x where x != x;
    # guard against array-valued cells whose != returns an array.
    try:
        return bool(x != x)
    except Exception:
        return False


def cell_mismatch(a, b):
    """True if a, b differ under the strict (driver-like) contract."""
    if a is None and b is None:
        return False
    if is_nanish(a) or is_nanish(b):
        return is_nanish(a) != is_nanish(b)
    if isinstance(a, float) or isinstance(b, float):
        if not (isinstance(a, float) and isinstance(b, float)):
            return True  # float vs non-float: representation divergence
        return repr(a) != repr(b)
    if isinstance(a, decimal.Decimal) != isinstance(b, decimal.Decimal):
        return True
    if isinstance(a, bool) != isinstance(b, bool):
        return True
    if type(a) is not type(b):
        # int widths etc. collapse via ==; bytes vs str must not
        if isinstance(a, (bytes, bytearray)) != isinstance(b, (bytes, bytearray)):
            return True
    return a != b


def cell_mismatch_tolerant(a, b):
    if a is None and b is None:
        return False
    if isinstance(a, float) or isinstance(b, float):
        an, bn = is_nanish(a), is_nanish(b)
        if an or bn:
            return an != bn
        return abs(a - b) > 1e-6 * max(1.0, abs(a), abs(b))
    return str(a) != str(b)


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
    decimal_cols = []
    cmp = cell_mismatch if strict else cell_mismatch_tolerant
    for c in gc:
        gl, el = got[c].tolist(), exp[c].tolist()
        # scan ALL values: a DECIMAL column whose first (sorted) row is
        # NULL must not escape the loud flag (r13 review)
        if strict and any(isinstance(x, decimal.Decimal)
                          for x in gl + el):
            decimal_cols.append(c)
        for a, b in zip(gl, el):
            if cmp(a, b):
                bad = (c, a, b); break
        if bad: break
    if bad:
        print(f"FAIL {q}: col {bad[0]}: {bad[1]!r} != {bad[2]!r}"); fails += 1
    elif decimal_cols:
        print(f"FAIL {q}: DECIMAL-typed output column(s) {decimal_cols} — "
              f"representation-unstable at the driver hash; cast to "
              f"BIGINT/DOUBLE at the gate boundary"); fails += 1
    else:
        print(f"OK   {q} ({len(got)} rows)")
print(("ALL OK", f"{fails} FAILURES")[fails > 0])
sys.exit(1 if fails else 0)
