#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate: read the
Verify output dir, run each oracle SQL in DuckDB against the sf parquet
tables, and compare row sets (sorted columns by name, sorted rows).
Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fail += 1
        continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fail += 1
        continue
    got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
        fail += 1
        continue
    if len(exp) != len(got):
        print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
        fail += 1
        continue
    exp = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    mismatch = None
    for c in exp.columns:
        a, b = exp[c], got[c]
        if str(a.dtype) != str(b.dtype):
            mismatch = f"dtype {c}: exp={a.dtype} got={b.dtype}"
            break
        if not a.equals(b):
            diff = (a != b) & ~(a.isna() & b.isna())
            i = diff[diff].index[0] if diff.any() else None
            if i is not None:
                mismatch = f"value {c}[{i}]: exp={a[i]!r} got={b[i]!r}"
                break
    if mismatch:
        print(f"FAIL {name}: {mismatch}")
        fail += 1
    else:
        print(f"OK   {name} ({len(exp)} rows)")
        ok += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
