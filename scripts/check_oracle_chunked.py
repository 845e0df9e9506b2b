#!/usr/bin/env python3
"""Chunked/streaming oracle comparator — the bounded-memory replica of
check_oracle.py's hash verdict (round-14, VERDICT r13 next-round #1).

check_oracle.py canonicalizes WHOLE outputs in pandas before comparing;
at the 100x replica the full-fact-output oracles (q116_group_cumprod's
60M-row/576MB dump and friends) blow up to 100+GB frames and the
comparator OOMs (r13: serial re-run killed at 114GB RSS).  This tool
never materializes a frame: both sides stream through fixed-size record
batches, every row is canonicalized to a string tuple and folded into an
order-independent multiset digest

    (row_count, sum of per-row SHA1 mod 2**192, xor of per-row SHA1)

so equal digests + counts + column-name lists imply the two canonical
row MULTISETS are equal — the same verdict as check_oracle.py's
sorted-frame equality (which is order-insensitive by construction),
at O(batch) memory.

Sides:
  spark  — pyarrow.dataset over the graft.Verify parquet directory,
           streamed with to_batches().
  oracle — DuckDB runs oracle_sql.json's SQL over the same parquet
           tables with a memory limit + spill directory, streamed with
           fetch_record_batch(); preserve_insertion_order=false lets
           DuckDB pipeline instead of buffering.

Deliberate, recorded differences from check_oracle.py:
  - Row order is never compared (neither tool compares it).
  - Integer-width unification: every integer/decimal-integral type
    stringifies as str(int(v)), so DuckDB HUGEINT 5 == Spark BIGINT 5.
    The old tool let pandas map HUGEINT to float64 and failed on
    '5.0' != '5'.  Numeric VALUES remain exact — no tolerance anywhere.
  - All nulls render as 'None' (the old tool rendered float-column
    nulls as 'nan' because pandas stores them as NaN; both engines'
    NULLs get the same token either way, so verdicts agree).
  Both relaxations are strictly type-cosmetic; any value difference
  still fails.

Usage:
  check_oracle_chunked.py <sfDir> <verifyOutDir> [--only p1,p2]
      [--skip p1,p2] [--batch-rows N] [--memory-limit 24GB]
      [--out verdicts.json] [--threads N]
"""
import argparse
import datetime
import glob
import hashlib
import json
import os
import sys
import tempfile
import time
from decimal import Decimal

import duckdb
import pyarrow as pa
import pyarrow.dataset as pads

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

MOD = 1 << 192
SEP = "\x1f"
SPILL_DIR = tempfile.mkdtemp(prefix="duckspill_")


def cell(v):
    """Canonical string for one value — mirrors check_oracle.cell with the
    int-width / null unifications documented above."""
    if v is None:
        return "None"
    if isinstance(v, float):
        return str(v)  # repr == str for py floats; nan -> 'nan', inf -> 'inf'
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, str):
        return v
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(cell(x) for x in v) + "]"
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return str(v)
    if isinstance(v, datetime.date):
        # pandas (the old tool) lifts date32 to datetime64, so a DuckDB
        # DATE equals a Spark midnight TIMESTAMP; keep that unification
        return f"{v} 00:00:00"
    if isinstance(v, Decimal):
        # DECIMAL(p, s>0) surfaces as float64 in the old tool (DuckDB
        # heaviside/round outputs): render through float. Scale-0
        # decimals (HUGEINT sums) stay integers.
        if v.as_tuple().exponent < 0:
            return str(float(v))
        return str(int(v))
    if isinstance(v, bytes):
        return str(v)
    if isinstance(v, dict):
        return "{" + ", ".join(f"{cell(k)}: {cell(x)}" for k, x in v.items()) + "}"
    # pandas NaT / numpy scalars reaching to_pylist on exotic types
    s = str(v)
    return "None" if s in ("NaT", "nan") else s


def normalize_batch(batch: pa.RecordBatch) -> pa.RecordBatch:
    """Cast ns timestamps to us so to_pylist on both sides agrees
    (pyarrow truncates ns->datetime anyway; make it explicit)."""
    cols, fields = [], []
    for i, f in enumerate(batch.schema):
        col = batch.column(i)
        t = f.type
        if pa.types.is_timestamp(t) and t.unit == "ns":
            t2 = pa.timestamp("us", tz=t.tz)
            col = col.cast(t2)
            f = pa.field(f.name, t2)
        fields.append(f)
        cols.append(col)
    return pa.RecordBatch.from_arrays(cols, schema=pa.schema(fields))


def fold_batch(batch: pa.RecordBatch, order, acc):
    """Fold one record batch into the (count, sum, xor) accumulator.
    `order` is the canonical (sorted) column index order."""
    batch = normalize_batch(batch)
    cols = [batch.column(i).to_pylist() for i in order]
    n, s, x = acc
    for row in zip(*cols):
        h = hashlib.sha1(SEP.join(cell(v) for v in row).encode("utf-8")).digest()
        hi = int.from_bytes(h, "big")
        n += 1
        s = (s + hi) % MOD
        x ^= hi
    return n, s, x


def digest_spark(dump_dir: str, batch_rows: int):
    ds = pads.dataset(dump_dir, format="parquet")
    names = sorted(ds.schema.names)
    order_names = names
    acc = (0, 0, 0)
    order = None
    for batch in ds.to_batches(batch_size=batch_rows):
        if order is None:
            order = [batch.schema.names.index(c) for c in order_names]
        acc = fold_batch(batch, order, acc)
    return names, acc


def digest_oracle(con, sql: str, batch_rows: int, materialize: bool = False):
    if materialize:
        # fetch_record_batch runs DuckDB in STREAMING execution mode,
        # which serializes some operators (the q61 quadratic pair join and
        # the ewm recursive windows ran near single-threaded for hours).
        # Materialized execution parallelizes fully; memory is bounded by
        # the connection's memory_limit + spill, so use this for
        # slow-compute / small-output oracles, streaming for huge outputs.
        tbl = con.execute(sql).fetch_arrow_table()
        names = sorted(tbl.schema.names)
        order = [tbl.schema.names.index(c) for c in names]
        acc = (0, 0, 0)
        for batch in tbl.to_batches(max_chunksize=batch_rows):
            if batch.num_rows:
                acc = fold_batch(batch, order, acc)
        return names, acc
    con.execute(sql)
    reader = con.fetch_record_batch(rows_per_batch=batch_rows)
    names = sorted(reader.schema.names)
    order = [reader.schema.names.index(c) for c in names]
    acc = (0, 0, 0)
    while True:
        try:
            batch = reader.read_next_batch()
        except StopIteration:
            break
        if batch.num_rows:
            acc = fold_batch(batch, order, acc)
    return names, acc


def compare_one(sf_dir, out_dir, name, sql, batch_rows, memory_limit, threads=None, materialize=False):
    t0 = time.time()
    try:
        s_names, s_acc = digest_spark(f"{out_dir}/{name}", batch_rows)
    except Exception as e:
        return {"name": name, "status": "ERROR", "detail": f"spark read: {e}"}
    if sql is None:
        status = "ROWS_ONLY" if s_acc[0] > 0 else "FAIL"
        return {"name": name, "status": status, "spark_rows": s_acc[0],
                "secs": round(time.time() - t0, 1)}
    con = duckdb.connect()
    try:
        if threads:
            con.execute(f"SET threads={threads}")
        con.execute(f"PRAGMA memory_limit='{memory_limit}'")
        # spill dir must be PER-PROCESS: concurrent DuckDBs sharing one
        # temp_directory delete each other's blocks and abort
        con.execute(f"PRAGMA temp_directory='{SPILL_DIR}'")
        con.execute("SET preserve_insertion_order=false")
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.isdir(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
            elif os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        try:
            o_names, o_acc = digest_oracle(con, sql, batch_rows, materialize)
        except Exception as e:
            return {"name": name, "status": "ERROR", "detail": f"oracle: {e}"}
    finally:
        con.close()
    res = {"name": name, "spark_rows": s_acc[0], "oracle_rows": o_acc[0],
           "secs": round(time.time() - t0, 1)}
    if s_names != o_names:
        res.update(status="FAIL", detail=f"columns {s_names} vs {o_names}")
    elif s_acc[0] != o_acc[0]:
        res.update(status="FAIL", detail=f"rows {s_acc[0]} vs {o_acc[0]}")
    elif s_acc != o_acc:
        res.update(status="FAIL", detail="hash mismatch (equal rows/columns)")
    else:
        res["status"] = "PASS"
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--only", default=None, help="comma-separated name prefixes")
    ap.add_argument("--skip", default=None, help="comma-separated name prefixes")
    ap.add_argument("--batch-rows", type=int, default=65536)
    ap.add_argument("--memory-limit", default="24GB")
    ap.add_argument("--out", default=None, help="write per-query verdicts JSON here")
    ap.add_argument("--threads", type=int, default=None,
                    help="DuckDB threads per query (default: library default)")
    ap.add_argument("--shard", default=None,
                    help="i/n — process only names where sorted-index %% n == i")
    ap.add_argument("--reverse", action="store_true",
                    help="walk names in reverse order (to race a forward worker)")
    ap.add_argument("--materialize", action="store_true",
                    help="run the oracle materialized (full parallelism) instead of streaming")
    ap.add_argument("--override", action="append", default=[],
                    help="name=file.sql — replace one query's oracle SQL with an "
                         "ALGEBRAICALLY IDENTICAL restatement (e.g. per-pair "
                         "invariants hoisted into a temp table). The restated SQL "
                         "must produce bit-identical values; use only for "
                         "compute-bound oracles, and record the restatement.")
    args = ap.parse_args()

    with open(f"{args.out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    for ov in args.override:
        name, path = ov.split("=", 1)
        with open(path) as f:
            oracles[name] = f.read()
    names = [os.path.basename(d) for d in sorted(glob.glob(f"{args.out_dir}/*"))
             if os.path.isdir(d)]
    if args.only:
        ps = args.only.split(",")
        names = [n for n in names if any(n.startswith(p) for p in ps)]
    if args.skip:
        ps = args.skip.split(",")
        names = [n for n in names if not any(n.startswith(p) for p in ps)]
    if args.shard:
        i, n = (int(x) for x in args.shard.split("/"))
        names = [q for k, q in enumerate(names) if k % n == i]
    if args.reverse:
        names = names[::-1]

    verdicts = []
    counts = {"PASS": 0, "ROWS_ONLY": 0, "FAIL": 0, "ERROR": 0}
    for name in names:
        r = compare_one(args.sf_dir, args.out_dir, name, oracles.get(name),
                        args.batch_rows, args.memory_limit, args.threads,
                        args.materialize)
        verdicts.append(r)
        counts[r["status"]] += 1
        line = f"{r['status']} {name} rows={r.get('spark_rows', '?')} secs={r.get('secs', '?')}"
        if r["status"] in ("FAIL", "ERROR"):
            line += f" :: {r.get('detail', '')}"
        print(line, flush=True)
        if args.out:  # incremental: a killed run still leaves its verdicts
            with open(args.out, "w") as f:
                json.dump(verdicts, f, indent=1)
    print(f"\npassed={counts['PASS']} rows_only={counts['ROWS_ONLY']} "
          f"failed={counts['FAIL']} errors={counts['ERROR']}")
    return 1 if counts["FAIL"] or counts["ERROR"] else 0


if __name__ == "__main__":
    sys.exit(main())
