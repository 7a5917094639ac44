#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle SQL in DuckDB against views over <sfDir>/*.parquet, loads the Spark
result parquet from <verifyOutDir>/<name>/, sorts columns by name and rows
by all columns, and compares (exact for non-floats, 1e-9 rel tol for
floats). Exit code 1 if any query mismatches.

Driver-side tooling only (duckdb/pandas/pyarrow are not available to the
Scala library itself).
"""
import duckdb
import glob
import json
import math
import os
import sys

import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) == 0:
        return df
    # stringify for a stable row sort even with NaN/None mixes
    key = df.astype(str).apply(lambda r: "\x00".join(r), axis=1)
    return df.iloc[key.argsort(kind="stable")].reset_index(drop=True)


def compare(name, spark_df, duck_df):
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        return f"columns differ: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"
    if len(spark_df) != len(duck_df):
        return f"row count differs: spark={len(spark_df)} duck={len(duck_df)}"
    a, b = canon(spark_df), canon(duck_df)
    for col in a.columns:
        va, vb = a[col], b[col]
        for i in range(len(va)):
            x, y = va.iloc[i], vb.iloc[i]
            xnull = x is None or (isinstance(x, float) and math.isnan(x)) or pd.isna(x)
            ynull = y is None or (isinstance(y, float) and math.isnan(y)) or pd.isna(y)
            if xnull and ynull:
                continue
            if xnull != ynull:
                return f"null mismatch col={col} row={i}: {x!r} vs {y!r}"
            if isinstance(x, float) != isinstance(y, float):
                # dtype skew (e.g. DuckDB HUGEINT -> pandas float64 vs
                # Spark int64): numerically equal but the driver hashes
                # the rendered value, so 1 vs 1.0 is a real failure —
                # the m42 r11 signature. Fail loudly here too.
                return f"dtype skew col={col} row={i}: {x!r} vs {y!r}"
            if isinstance(x, float) or isinstance(y, float):
                # exact: the query rounding discipline yields bitwise
                # parity (verified across all queries); keep it that way
                if float(x) != float(y):
                    return f"float mismatch col={col} row={i}: {x!r} vs {y!r}"
            elif hasattr(x, "timestamp") and hasattr(y, "timestamp"):
                if pd.Timestamp(x).tz_localize(None) != pd.Timestamp(y).tz_localize(None):
                    return f"ts mismatch col={col} row={i}: {x!r} vs {y!r}"
            else:
                if str(x) != str(y):
                    return f"value mismatch col={col} row={i}: {x!r} vs {y!r}"
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    failures = []
    names = sorted(os.listdir(out_dir))
    for name in names:
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracles:
            print(f"  [rows-only] {name}: {len(spark_df)} rows")
            continue
        try:
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"✗ {name}: oracle SQL failed: {e}")
            failures.append(name)
            continue
        err = compare(name, spark_df, duck_df)
        if err:
            print(f"✗ {name}: {err}")
            failures.append(name)
        else:
            print(f"✓ {name}: {len(spark_df)} rows match")
    missing = set(oracles) - {n for n in names if os.path.isdir(os.path.join(out_dir, n))}
    for name in sorted(missing):
        print(f"✗ {name}: oracle declared but no spark output")
        failures.append(name)
    if failures:
        print(f"\nFAILED: {failures}")
        sys.exit(1)
    print("\nALL OK")


if __name__ == "__main__":
    main()
