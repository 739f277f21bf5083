#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables and compare against the Spark result
parquet written by graft.Verify (columns sorted by name, rows sorted, values
compared with a small float tolerance report AND exact-hash report)."""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

args = [a for a in sys.argv[1:] if not a.startswith("--json")]
json_out = next((a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--json=")), None)
sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
out_dir = args[1] if len(args) > 1 else "/tmp/verify_out"
report = {}

con = duckdb.connect()
# bounded resources: an unbounded DuckDB (one thread per core, unlimited
# memory) alongside leftover Spark JVMs has twice aborted the sf0.1 run on
# this box (ArrowMemoryError / EAGAIN on thread spawn) — 8 threads + 24GB
# costs seconds and removes the failure mode
con.sql("SET threads TO 8")
con.sql("SET memory_limit = '24GB'")
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize types for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def record(name, **kw):
    report[name] = {"rows_match": None, "schema_match": None, "hash_match": None,
                    "spark_rows": None, "oracle_rows": None, "err": None, **kw}

fails = 0
for name in sorted(oracle):
    sql = oracle[name]
    spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not spark_files:
        print(f"{name}: MISSING spark output"); fails += 1
        record(name, err="missing spark output"); continue
    try:
        odf = canon(con.sql(sql).df())
    except Exception as e:
        print(f"{name}: ORACLE ERROR {e}"); fails += 1
        record(name, err=f"oracle error: {e}"); continue
    sdf = canon(pd.concat([pd.read_parquet(f) for f in spark_files]))
    if list(sdf.columns) != list(odf.columns):
        print(f"{name}: COLUMN MISMATCH spark={list(sdf.columns)} oracle={list(odf.columns)}"); fails += 1
        record(name, schema_match=False, spark_rows=len(sdf), oracle_rows=len(odf)); continue
    if len(sdf) != len(odf):
        print(f"{name}: ROWCOUNT MISMATCH spark={len(sdf)} oracle={len(odf)}"); fails += 1
        record(name, schema_match=True, rows_match=False,
               spark_rows=len(sdf), oracle_rows=len(odf)); continue
    exact = True; approx = True
    for c in sdf.columns:
        s, o = sdf[c], odf[c]
        if pd.api.types.is_float_dtype(s) or pd.api.types.is_float_dtype(o):
            se, oe = s.fillna(-1e308).to_numpy(dtype=float), o.fillna(-1e308).to_numpy(dtype=float)
            if not np.array_equal(se, oe):
                exact = False
                if not np.allclose(se, oe, rtol=1e-9, atol=1e-12, equal_nan=True):
                    approx = False
                    bad = np.where(~np.isclose(se, oe, rtol=1e-9, atol=1e-12))[0][:3]
                    print(f"  {name}.{c} diff rows {bad}: spark={se[bad]} oracle={oe[bad]}")
        else:
            if not s.astype(str).equals(o.astype(str)):
                exact = False; approx = False
                neq = (s.astype(str) != o.astype(str))
                idx = list(s.index[neq])[:3]
                print(f"  {name}.{c} diff rows {idx}: spark={list(s[neq][:3])} oracle={list(o[neq][:3])}")
    status = "OK-exact" if exact else ("OK-approx" if approx else "FAIL")
    if status == "FAIL": fails += 1
    record(name, rows_match=True, schema_match=True, hash_match=exact,
           spark_rows=len(sdf), oracle_rows=len(odf),
           err=None if status != "FAIL" else "value mismatch")
    print(f"{name}: {status} ({len(sdf)} rows, {len(sdf.columns)} cols)")
print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
if json_out:
    with open(json_out, "w") as f:
        json.dump(report, f, indent=1)
sys.exit(1 if fails else 0)
