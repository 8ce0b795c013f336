#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Reads the Verify output dir (per-query parquet + oracle_sql.json), runs each
oracle SQL in DuckDB over the same sf dir, then compares after sorting
columns by name and rows by value. Reports per-query row/schema/hash match.

Driver-side tooling only (python/duckdb/pyarrow are NOT dependencies of the
Scala library).
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

def load_spark(outdir, name):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        return None
    return pq.read_table(files[0]).to_pandas()

def norm(df):
    df = df[sorted(df.columns)]
    # canonicalize dtypes for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("float32"):
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(sfdir, outdir):
    con = duckdb.connect()
    tables = ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        got = load_spark(outdir, name)
        if got is None:
            results[name] = "NO_SPARK_OUTPUT"
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            results[name] = f"SCHEMA_NAMES: spark={list(g.columns)} duck={list(e.columns)}"
            continue
        if len(g) != len(e):
            results[name] = f"ROWCOUNT: spark={len(g)} duck={len(e)}"
            continue
        mismatch = None
        for c in g.columns:
            ga, ea = g[c].values, e[c].values
            import numpy as np
            if str(g[c].dtype) == "object" or str(e[c].dtype) == "object":
                if not (g[c].astype(str).values == e[c].astype(str).values).all():
                    mismatch = c
                    break
            else:
                ga64 = pd.to_numeric(g[c], errors="coerce").astype("float64").values
                ea64 = pd.to_numeric(e[c], errors="coerce").astype("float64").values
                neq = ~((ga64 == ea64) | (pd.isna(ga64) & pd.isna(ea64)))
                if neq.any():
                    i = int(neq.argmax())
                    mismatch = f"{c} (row {i}: spark={ga64[i]!r} duck={ea64[i]!r})"
                    break
        results[name] = "OK" if mismatch is None else f"VALUE_MISMATCH: {mismatch}"
    # queries without oracle (rows-only)
    for d in sorted(glob.glob(f"{outdir}/*/")):
        qn = os.path.basename(d.rstrip("/"))
        if qn not in oracle:
            t = load_spark(outdir, qn)
            results[qn] = f"ROWS_ONLY rows={0 if t is None else len(t)}"
    ok = sum(1 for v in results.values() if v == "OK")
    for k, v in sorted(results.items()):
        print(f"{'PASS' if v=='OK' else 'INFO' if v.startswith('ROWS_ONLY') else 'FAIL'} {k}: {v}")
    print(f"\n{ok}/{len(oracle)} oracle-checked queries pass")

if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
         sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")
