#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark dump), runs the matching
oracle_sql.json entry in DuckDB with views named after the parquet tables
in <sfDir>, sorts columns by name and rows by all columns, and diffs.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def norm(df: pd.DataFrame) -> pd.DataFrame:
    # Columns sorted by name; rows kept IN ORDER — stricter than a
    # sorted-rows compare, so order-of-output bugs surface here even if
    # the driver's hash turns out to be order-insensitive.
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for compare: ints -> int64, floats -> float64
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[us]")
    return df.reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            print(f"[MISS] {name}: no spark dump"); n_fail += 1; continue
        try:
            got = norm(pd.concat([pd.read_parquet(f) for f in
                                  sorted(glob.glob(spark_dir + "/*.parquet"))]))
            want = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"[ERR ] {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"[FAIL] {name}: columns {list(got.columns)} vs {list(want.columns)}"); n_fail += 1; continue
        if len(got) != len(want):
            print(f"[FAIL] {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        if got.equals(want):
            print(f"[ok  ] {name} ({len(got)} rows)"); n_pass += 1
        else:
            diff = (got != want) & ~(got.isna() & want.isna())
            bad = diff.any(axis=1)
            print(f"[FAIL] {name}: {bad.sum()} mismatched rows, e.g.")
            print(pd.concat([got[bad].head(3).add_suffix("_spark"),
                             want[bad].head(3).add_suffix("_duck")], axis=1))
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
