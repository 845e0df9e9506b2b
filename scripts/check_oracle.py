#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over the same parquet tables,
then compares EXACT stringified frames (columns sorted by name, rows sorted
by stringified values). This intentionally mirrors the driver's exact-hash
check: NO numeric tolerance and NO int/float dtype unification, so a DuckDB
HUGEINT/TINYINT output typed differently from Spark's BIGINT/DOUBLE fails
here exactly like it fails the driver gate (round-3 lesson: q56/q123).
"""
import glob
import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def cell(v) -> str:
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ", ".join(cell(x) for x in v) + "]"
    if v is None:
        return "None"
    try:
        if pd.isna(v):
            return "nan"
    except (TypeError, ValueError):
        pass
    if isinstance(v, (float, np.floating)):
        return str(float(v))
    return str(v)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        # timestamps: normalize tz + unit so ns-vs-us resolution doesn't
        # produce spurious textual diffs (both engines mean the same instant)
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            col = pd.to_datetime(df[c])
            if getattr(col.dt, "tz", None) is not None:
                col = col.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = col.astype("datetime64[ns]")
    s = pd.DataFrame({c: df[c].map(cell) for c in df.columns})
    if len(s.columns):
        s = s.sort_values(by=list(s.columns), kind="mergesort")
    return s.reset_index(drop=True)


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
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            failures.append(name)
            print(f"FAIL {name}: columns {list(g.columns)} vs oracle {list(e.columns)}")
            continue
        if len(g) != len(e):
            failures.append(name)
            print(f"FAIL {name}: rows {len(g)} vs oracle {len(e)}")
            continue
        if g.equals(e):
            passed.append(name)
        else:
            failures.append(name)
            neq = (g != e)
            bad_cols = [c for c in g.columns if neq[c].any()]
            msgs = []
            for c in bad_cols[:3]:
                i = int(neq[c].idxmax())
                msgs.append(f"col {c} row {i}: spark={g[c][i]!r} oracle={e[c][i]!r} "
                            f"({int(neq[c].sum())} diffs)")
            print(f"FAIL {name}: " + " | ".join(msgs))
    print(f"\npassed={len(passed)} rows_only={len(rows_only)} failed={len(failures)}")
    if rows_only:
        print("rows-only:", ", ".join(rows_only))
    if failures:
        print("failed:", ", ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
