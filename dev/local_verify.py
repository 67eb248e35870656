#!/usr/bin/env python3
"""Dev-only emulation of the driver's correctness gate.

Reads the parquet outputs written by `sbt "runMain graft.Verify <sfDir> <outDir>"`
plus outDir/oracle_sql.json, runs each oracle in DuckDB over the same
scale-factor tables, and compares rows / schema / values strictly.
Not part of the shipped library (the engine itself is pure Scala Spark).
"""
import json, sys, glob, os
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
names = sorted(d for d in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{d}"))
fails = []
# Verify writes the list of queries it ATTEMPTED; any attempted query with
# no output dir failed at dump time — flag it instead of silently shrinking
# the pass denominator.
manifest_path = f"{out_dir}/manifest.txt"
if os.path.exists(manifest_path):
    attempted = [l for l in open(manifest_path).read().splitlines() if l]
    for missing in sorted(set(attempted) - set(names)):
        fails.append((missing, "no output written (failed at dump time)"))
        print(f"{missing:24s} MISSING OUTPUT (failed at dump time)")
    # stale dirs from a previous run into the same outDir (renamed/removed
    # queries, or a prior full run before a SPARK_GRAFT_ONLY subset) are
    # not part of this run — exclude them rather than inflate the count
    for extra in sorted(set(names) - set(attempted)):
        print(f"{extra:24s} skipped: not in this run's manifest (stale dir)")
    names = [n for n in names if n in set(attempted)]
for name in names:
    got = con.execute(
        f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
    got = got[sorted(got.columns)]
    if name not in oracle:
        print(f"{name:24s} rows-only: {len(got)} rows " +
              ("OK" if len(got) > 0 else "EMPTY!"))
        if len(got) == 0:
            fails.append((name, "empty rows-only result"))
        continue
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle SQL failed: {e}"))
        print(f"{name:24s} ORACLE SQL ERROR: {e}")
        continue
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        fails.append((name, f"schema: spark={list(got.columns)} duck={list(exp.columns)}"))
        print(f"{name:24s} SCHEMA MISMATCH spark={list(got.columns)} duck={list(exp.columns)}")
        continue
    if len(got) != len(exp):
        fails.append((name, f"rows: spark={len(got)} duck={len(exp)}"))
        print(f"{name:24s} ROW COUNT spark={len(got)} duck={len(exp)}")
        continue
    # strict value compare, column by column (report dtype for mismatches)
    bad = []
    for c in got.columns:
        a, b = got[c], exp[c]
        try:
            import pandas as pd
            amask, bmask = a.isna(), b.isna()
            if not (amask.values == bmask.values).all():
                bad.append((c, "null-pattern", str(a.dtype), str(b.dtype)))
                continue
            av, bv = a[~amask], b[~bmask]
            if str(a.dtype) == 'object' or str(b.dtype) == 'object':
                eq = (av.astype(str).values == bv.astype(str).values).all()
            else:
                eq = (av.values == bv.values).all()
            if not eq:
                idx = (av.values != bv.values).nonzero()[0][:3]
                bad.append((c, f"values@{list(idx)}: spark={list(av.values[idx][:3])} duck={list(bv.values[idx][:3])}",
                            str(a.dtype), str(b.dtype)))
        except Exception as e:
            bad.append((c, f"compare error: {e}", str(a.dtype), str(b.dtype)))
    if bad:
        fails.append((name, bad))
        print(f"{name:24s} VALUE MISMATCH {bad}")
    else:
        dtypes_differ = [(c, str(got[c].dtype), str(exp[c].dtype))
                         for c in got.columns if str(got[c].dtype) != str(exp[c].dtype)]
        note = f"  (dtype diff: {dtypes_differ})" if dtypes_differ else ""
        print(f"{name:24s} OK {len(got)} rows{note}")

total = len(names) + sum(1 for f in fails if f[1] == "no output written (failed at dump time)")
print(f"\n{total - len(fails)}/{total} pass")
sys.exit(1 if fails else 0)
