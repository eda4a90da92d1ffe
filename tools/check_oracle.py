#!/usr/bin/env python3
"""Local pre-check of the driver's correctness gate.

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
testdata parquet tables, loads the corresponding Spark result parquet from
<outDir>/<name>/, and compares: row count, column names, and values IN
QUERY OUTPUT ORDER (column order normalized by name). The driver's hash
gate is order-sensitive, so every query must end in a total-order sort —
comparing in order catches nondeterministic tie-breaks that a
sort-by-all-columns compare would mask (the round-1 q01 failure mode).

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import json
import math
import sys
import glob

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: float(v) if hasattr(v, "as_tuple") else v)  # Decimal→float
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.reset_index(drop=True)


def cmp_frames(a: pd.DataFrame, b: pd.DataFrame, name: str):
    issues = []
    if sorted(a.columns) != sorted(b.columns):
        issues.append(f"columns differ: spark={sorted(a.columns)} oracle={sorted(b.columns)}")
        return issues
    if len(a) != len(b):
        issues.append(f"row count differs: spark={len(a)} oracle={len(b)}")
        return issues
    a, b = norm(a), norm(b)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            neq = ~((av == bv) | (av.isna() & bv.isna()))
            if neq.any():
                i = neq.idxmax()
                mx = (av - bv).abs().max()
                issues.append(
                    f"col {c}: {neq.sum()} mismatches, first@{i} "
                    f"spark={av[i]!r} oracle={bv[i]!r} maxabs={mx}")
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                i = (~eq).idxmax()
                issues.append(
                    f"col {c}: {(~eq).sum()} mismatches, first@{i} "
                    f"spark={av[i]!r} oracle={bv[i]!r}")
    return issues


def main(sf_dir: str, out_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output parquet")
            n_fail += 1
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files])
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        issues = cmp_frames(spark_df, duck_df, name)
        if issues:
            n_fail += 1
            print(f"FAIL {name} ({len(spark_df)} rows):")
            for it in issues:
                print(f"    {it}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(spark_df)} rows)")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
