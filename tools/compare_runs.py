#!/usr/bin/env python3
"""Byte-level row-set compare of two graft.Verify output dirs.

Used for the parallelism-invariance sweep: run Verify twice with
SPARK_GRAFT_CPUS=4 and =32 into two dirs, then diff every query's
row set (columns sorted by name, rows sorted by the stringified row).
Any difference is partitioning-order nondeterminism — a correctness
bug class the DuckDB oracle can miss when it canonicalizes.

Usage: python3 tools/compare_runs.py <dirA> <dirB>
Exit 1 if any query's row set differs or a query is missing on one side.
"""
import glob
import os
import sys

import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) == 0:
        return df
    key = df.astype(str).apply(lambda r: "\x00".join(r), axis=1)
    return df.iloc[key.argsort(kind="stable")].reset_index(drop=True)


def load(d, name):
    files = glob.glob(os.path.join(d, name, "*.parquet"))
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def main():
    a, b = sys.argv[1], sys.argv[2]
    qa = {os.path.basename(p) for p in glob.glob(os.path.join(a, "*"))
          if os.path.isdir(p)}
    qb = {os.path.basename(p) for p in glob.glob(os.path.join(b, "*"))
          if os.path.isdir(p)}
    bad = []
    if qa != qb:
        print(f"query sets differ: only-A={sorted(qa - qb)} "
              f"only-B={sorted(qb - qa)}")
        bad.append("__sets__")
    for q in sorted(qa & qb):
        da, db = canon(load(a, q)), canon(load(b, q))
        if list(da.columns) != list(db.columns):
            print(f"✗ {q}: columns differ")
            bad.append(q)
            continue
        if len(da) != len(db):
            print(f"✗ {q}: rows {len(da)} vs {len(db)}")
            bad.append(q)
            continue
        if not da.astype(str).equals(db.astype(str)):
            print(f"✗ {q}: row values differ")
            bad.append(q)
            continue
    print(f"compared {len(qa & qb)} queries: "
          f"{len(bad)} differ" + ("" if bad else " — INVARIANT"))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
