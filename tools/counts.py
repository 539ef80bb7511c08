#!/usr/bin/env python3
"""Regenerate the COVERAGE.md header counts from the registry itself
(dev tool — r12 verdict flagged hand-maintained counts drifting).

  python3 tools/counts.py [verify_outdir]

Queries  = entries in the Verify dump's oracle_sql.json (the driver's
           view of the catalog; every queries key has an oracle).
Suites   = concrete ScalaTest classes (extends SparkSpecBase / AnyFunSuite,
           excluding the abstract base).
Tests    = `test(` call sites across the suites (upper bound of cases;
           the authoritative number is the sbt test summary)."""
import glob
import json
import os
import re
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"

osql = os.path.join(outdir, "oracle_sql.json")
if os.path.exists(osql):
    n_q = len(json.load(open(osql)))
    print(f"queries (oracle_sql.json @ {outdir}): {n_q}")
else:
    print(f"queries: no {osql} — run graft.Verify first")

suites = 0
tests = 0
for p in glob.glob(os.path.join(repo, "src/test/scala/graft/**/*.scala"), recursive=True):
    src = open(p).read()
    suites += len(re.findall(
        r"^class \w+ extends (?:SparkSpecBase|AnyFunSuite)", src, re.M))
    tests += len(re.findall(r"^\s*test\(", src, re.M))
print(f"concrete suites: {suites}")
print(f"test(...) call sites: {tests}")

# Soak entries = queries recorded in the cumulative BENCH_sf1.json
# (r13 verdict item: the COVERAGE prose drifted one behind the file;
# regenerate, don't hand-maintain).
bench = os.path.join(repo, "BENCH_sf1.json")
if os.path.exists(bench):
    n_soak = len(json.load(open(bench)).get("queries", {}))
    print(f"soak entries (BENCH_sf1.json): {n_soak}")
else:
    print("soak entries: no BENCH_sf1.json")
