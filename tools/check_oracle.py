#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads the parquet dumps Verify wrote to OUTDIR plus oracle_sql.json, runs each
oracle statement in DuckDB with views over the same sf tables, and compares
(sorted rows, columns sorted by name). Usage:

    python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out [name...]
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes: timestamps → int64 us, integer widths → int64
    # (driver hashing is insensitive to int width — embed_* passed with
    # Spark int32 rank vs DuckDB BIGINT — but int-vs-float DOES fail there),
    # floats stay float64
    for c in df.columns:
        if np.issubdtype(df[c].dtype, np.datetime64):
            df[c] = df[c].astype("datetime64[us]").astype("int64")
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype("float64")
    sort_cols = list(df.columns)
    try:
        df = df.sort_values(sort_cols, kind="mergesort")
    except Exception:
        df = df.sort_values([c for c in sort_cols if df[c].dtype != object], kind="mergesort")
    return df.reset_index(drop=True)

def compare(name, spark_df, duck_df):
    a, b = norm(spark_df), norm(duck_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT MISMATCH spark={len(a)} duck={len(b)}"
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        # Driver hashes typed values, so a dtype mismatch (e.g. DuckDB
        # sum(int) → HUGEINT → float64 vs Spark int64) fails there even when
        # the numbers coerce equal. Be exactly as strict.
        if a[c].dtype != b[c].dtype:
            return (f"DTYPE MISMATCH col={c} spark={a[c].dtype} duck={b[c].dtype}")
        if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(b[c].dtype, np.floating):
            av = pd.to_numeric(a[c], errors="coerce").values.astype(float)
            bv = pd.to_numeric(b[c], errors="coerce").values.astype(float)
            ok = ((np.isnan(av) & np.isnan(bv)) | (av == bv))
            if not ok.all():
                i = int(np.argmin(ok))
                return f"VALUE MISMATCH col={c} row={i} spark={av[i]!r} duck={bv[i]!r}"
        else:
            ok = (pd.Series(av).astype(str) == pd.Series(bv).astype(str)).values
            if not ok.all():
                i = int(np.argmin(ok))
                return f"VALUE MISMATCH col={c} row={i} spark={av[i]!r} duck={bv[i]!r}"
    return None

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        try:
            duck_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        err = compare(name, spark_df, duck_df)
        if err:
            print(f"FAIL {name}: {err}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    # names with no oracle → rows-only
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if os.path.isdir(d) and name not in oracles:
            files = glob.glob(f"{d}/*.parquet")
            nrows = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            print(f"ROWS-ONLY {name}: {nrows} rows")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
