#!/usr/bin/env python3
"""Local simulation of the driver's correctness gate.

Runs graft.Verify (sbt) at a given SF dir, then executes each query's
oracle SQL in DuckDB over the same parquet tables and compares results
(column names sorted, values compared exactly, rows compared both
order-sensitively and as sorted multisets).

Usage: python3 scripts/check_oracle.py [sfdir] [outdir] [--skip-verify]
"""
import sys, json, glob, os, subprocess

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
skip = "--skip-verify" in sys.argv

if not skip:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {sfdir} {outdir}'],
        cwd="/root/repo", capture_output=True, text=True, timeout=1800)
    if r.returncode != 0:
        print(r.stdout[-4000:]); print(r.stderr[-4000:])
        sys.exit("verify run failed")
    for line in r.stdout.splitlines():
        if "[verify]" in line or "error" in line.lower():
            print(line)

import duckdb
con = duckdb.connect()
tables = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
for t in tables:
    p = f"{sfdir}/{t}.parquet"
    if os.path.isdir(p):  # ScaleGen output: a directory of part files
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
    elif os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok, bad = [], []
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    got = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchdf()
    if name not in oracle:
        print(f"  {name}: no oracle — rows={len(got)}")
        continue
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        bad.append((name, f"oracle SQL failed: {e}"))
        continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        bad.append((name, f"schema mismatch: spark={gc} oracle={ec}"))
        continue
    got, exp = got[gc], exp[ec]
    if len(got) != len(exp):
        bad.append((name, f"rowcount: spark={len(got)} oracle={len(exp)}"))
        continue
    gv = got.values.tolist()
    ev = exp.values.tolist()
    # Compare via repr so NaN/None cells (e.g. an all-NULL column)
    # don't fail elementwise equality: float('nan') != float('nan')
    # would flag a correctly-ordered result as ORDER-differs.
    order_ok = list(map(repr, gv)) == list(map(repr, ev))
    if not order_ok:
        gs = sorted(map(repr, gv)); es = sorted(map(repr, ev))
        if gs == es:
            bad.append((name, "VALUES MATCH but row ORDER differs"))
        else:
            diff = [(a, b) for a, b in zip(gs, es) if a != b][:3]
            bad.append((name, f"value mismatch, e.g. {diff}"))
        continue
    ok.append((name, len(got)))

for n, r in ok:
    print(f"  PASS {n} ({r} rows)")
for n, msg in bad:
    print(f"  FAIL {n}: {msg}")
print(f"{len(ok)} pass, {len(bad)} fail")
sys.exit(1 if bad else 0)
