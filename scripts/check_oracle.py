#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over the same parquet tables,
normalizes (sort columns by name, sort rows, stringify) and diffs.
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # unify dtypes: ints → int64, floats → float64, timestamps → utc-naive ns
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("float64")  # int/float unification
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written directory datasets (ScaleGen)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    failures, passed, rows_only = [], [], []
    for d in sorted(glob.glob(f"{out_dir}/*")):
        name = os.path.basename(d)
        if not os.path.isdir(d):
            continue
        got = pd.read_parquet(d)
        if name not in oracles:
            (rows_only if len(got) > 0 else failures).append(name)
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: oracle SQL error: {e}")
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            failures.append(name)
            print(f"FAIL {name}: columns {list(g.columns)} vs oracle {list(e.columns)}")
            continue
        if len(g) != len(e):
            failures.append(name)
            print(f"FAIL {name}: rows {len(g)} vs oracle {len(e)}")
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=False,
                                          rtol=0, atol=1e-9)
            passed.append(name)
        except AssertionError as ex:
            failures.append(name)
            msg = str(ex).split("\n")
            print(f"FAIL {name}: " + " | ".join(msg[:6]))
    print(f"\npassed={len(passed)} rows_only={len(rows_only)} failed={len(failures)}")
    if rows_only:
        print("rows-only:", ", ".join(rows_only))
    if failures:
        print("failed:", ", ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
