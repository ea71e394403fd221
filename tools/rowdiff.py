#!/usr/bin/env python3
"""Local row-diff of a Verify dump vs its DuckDB oracle.

Usage: rowdiff.py <verify_out_dir> <sf_dir> <query_name>

Loads <out>/<name> (Spark parquet) and runs the oracle SQL from
<out>/oracle_sql.json in DuckDB over the sf parquet tables, then prints
schema + the first differing rows after sorting both sides by all columns.
Diagnosis-only (driver-side python libs); not part of the library.
"""
import json, sys, glob
import duckdb, pandas as pd

out, sf, name = sys.argv[1], sys.argv[2], sys.argv[3]
oracle = json.load(open(f"{out}/oracle_sql.json"))[name]

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
odf = con.execute(oracle).df()

sdf = pd.concat([pd.read_parquet(p) for p in glob.glob(f"{out}/{name}/*.parquet")],
                ignore_index=True)

print("spark dtypes:\n", sdf.dtypes)
print("oracle dtypes:\n", odf.dtypes)

cols = sorted(odf.columns)
assert sorted(sdf.columns) == cols, (sorted(sdf.columns), cols)
sdf, odf = sdf[cols], odf[cols]

def canon(df):
    df = df.copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    return df.sort_values(cols, kind="mergesort").reset_index(drop=True)

s, o = canon(sdf), canon(odf)
print(f"rows: spark={len(s)} oracle={len(o)}")
neq = None
if len(s) == len(o):
    mask = (s != o) & ~(s.isna() & o.isna())
    bad = mask.any(axis=1)
    print(f"differing rows: {bad.sum()}")
    for i in s.index[bad][:15]:
        print("SPARK :", s.loc[i].to_dict())
        print("ORACLE:", o.loc[i].to_dict())
else:
    merged = s.merge(o, how="outer", indicator=True, on=cols)
    print(merged[merged["_merge"] != "both"].head(30))
