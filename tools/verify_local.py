#!/usr/bin/env python3
"""Local pre-check of the driver's correctness gate.

Usage: python3 tools/verify_local.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each SQL
in DuckDB with views named after the synthetic tables over <sfDir>, and
compares against the Spark parquet dump at <verifyOutDir>/<name>/ the way the
driver does: columns sorted by name, rows sorted, values hashed.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # normalize types for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: repr(v))
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def kind(dt) -> str:
    s = str(dt)
    if s.startswith(("int", "uint", "Int", "UInt")):
        return "i"
    if s.startswith(("float", "Float")):
        return "f"
    if s.startswith("datetime"):
        return "d"
    return "o"


def compare(name, spark_df, duck_df):
    # dtype-KIND drift (e.g. DuckDB HUGEINT → float64 vs Spark int64) hashes
    # differently in the driver even when values compare equal numerically —
    # fail it here so it can't hide behind the tolerant value compare below
    kind_bad = [
        f"col {c}: dtype kind spark={spark_df[c].dtype} oracle={duck_df[c].dtype}"
        for c in sorted(set(spark_df.columns) & set(duck_df.columns))
        if kind(spark_df[c].dtype) != kind(duck_df[c].dtype)
    ]
    if kind_bad:
        return "; ".join(kind_bad)
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT {len(a)} vs {len(b)}"
    bad = []
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            av = av.astype(float); bv = bv.astype(float)
            eq = (av == bv) | (np.isnan(av) & np.isnan(bv))
            if not eq.all():
                i = int(np.argmin(eq))
                d = np.nanmax(np.abs(av - bv))
                bad.append(f"col {c}: {int((~eq).sum())} diffs, maxabs={d:.3e} e.g. {av[i]!r} vs {bv[i]!r}")
        else:
            try:
                eq = (a[c].values == b[c].values) | (pd.isna(a[c]).values & pd.isna(b[c]).values)
            except Exception:
                eq = a[c].astype(str).values == b[c].astype(str).values
            if not eq.all():
                i = int(np.argmin(eq))
                bad.append(f"col {c}: {int((~eq).sum())} diffs e.g. {a[c].values[i]!r} vs {b[c].values[i]!r}")
    return "; ".join(bad) if bad else None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for tb in TABLES:
        p = f"{sf_dir}/{tb}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {tb} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        pq_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{pq_dir}/*.parquet")
        if not files:
            print(f"[FAIL] {name}: no spark output"); n_bad += 1; continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        except Exception as e:
            print(f"[FAIL] {name}: cannot read spark output: {e}"); n_bad += 1; continue
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}"); n_bad += 1; continue
        err = compare(name, spark_df, duck_df)
        if err:
            print(f"[FAIL] {name}: {err}"); n_bad += 1
        else:
            print(f"[ ok ] {name} ({len(spark_df)} rows)"); n_ok += 1
    # queries without oracle: just check rows>0
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name in oracles:
            continue
        files = glob.glob(f"{d}/*.parquet")
        n = sum(pd.read_parquet(f).shape[0] for f in files) if files else 0
        print(f"[{'rows' if n > 0 else 'FAIL'}] {name}: {n} rows (no oracle)")
        if n == 0: n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
