#!/usr/bin/env python3
"""Local simulation of the driver's t2 correctness gate: run Verify's parquet
outputs against DuckDB executing oracle_sql.json over the same sf tables.
Compares schemas (loosely), row counts, and value-hash after sorting columns
by name and rows by all columns. Reports per-query PASS/FAIL with diffs.
"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps/dates to strings, floats stay floats
    import datetime
    for c in df.columns:
        if str(df[c].dtype).startswith(("datetime", "date")):
            df[c] = df[c].astype(str).str.slice(0, 10)
        elif df[c].dtype == object and len(df) and isinstance(
                df[c].iloc[0], (datetime.date, datetime.datetime)):
            df[c] = df[c].astype(str).str.slice(0, 10)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def compare(name, spark_df, duck_df):
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        return f"FAIL cols spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"FAIL rows spark={len(a)} duck={len(b)}"
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        for i in range(len(av)):
            x, y = av[i], bv[i]
            if isinstance(x, float) and isinstance(y, float):
                if (math.isnan(x) and math.isnan(y)):
                    continue
                if x != y:
                    return f"FAIL value col={c} row={i} spark={x!r} duck={y!r} (delta={x-y!r})"
            elif x != y:
                return f"FAIL value col={c} row={i} spark={x!r} duck={y!r}"
    return "PASS"

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    import glob, os
    produced = {os.path.basename(p) for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p)}
    for name in sorted(produced):
        try:
            spark_df = pq.read_table(f"{out_dir}/{name}").to_pandas()
        except Exception as e:
            results[name] = f"FAIL read spark output: {e}"
            continue
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(spark_df)}" + (" (EMPTY!)" if len(spark_df)==0 else "")
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"FAIL oracle sql: {e}"
            continue
        try:
            results[name] = compare(name, spark_df, duck_df)
        except Exception as e:
            results[name] = f"FAIL compare: {e}"
    for name in sorted(oracle):
        if name not in produced:
            results[name] = "FAIL spark output missing"
    npass = sum(1 for v in results.values() if v.startswith(("PASS","ROWS_ONLY")))
    for k, v in sorted(results.items()):
        print(f"{k:28s} {v}")
    print(f"== {npass}/{len(results)} ok")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
