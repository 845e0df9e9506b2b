#!/usr/bin/env python3
"""Engine-side dump equality: digest two graft.Verify output dirs with
check_oracle_chunked's canonical multiset digest (no oracle run needed).

Used to close the transitive 100x claim for operators rewired mid-round:
if the new build's dump digests equal the old build's, and the old dump
hash-verified against the DuckDB oracle, the new build is oracle-green
at that scale without re-running multi-hour window oracles.

Usage: compare_dumps.py <oldOutDir> <newOutDir> [--only p1,p2]
"""
import importlib.util
import os
import sys

spec = importlib.util.spec_from_file_location(
    "coc", os.path.join(os.path.dirname(__file__), "check_oracle_chunked.py"))
coc = importlib.util.module_from_spec(spec)
spec.loader.exec_module(coc)


def main():
    old_dir, new_dir = sys.argv[1], sys.argv[2]
    only = None
    if len(sys.argv) > 4 and sys.argv[3] == "--only":
        only = sys.argv[4].split(",")
    names = sorted(n for n in os.listdir(new_dir)
                   if os.path.isdir(os.path.join(new_dir, n)))
    if only:
        names = [n for n in names if any(n.startswith(p) for p in only)]
    bad = 0
    for n in names:
        if not os.path.isdir(os.path.join(old_dir, n)):
            print(f"SKIP {n}: not in old dir", flush=True)
            continue
        o_names, o_acc = coc.digest_spark(os.path.join(old_dir, n), 65536)
        n_names, n_acc = coc.digest_spark(os.path.join(new_dir, n), 65536)
        if o_names == n_names and o_acc == n_acc:
            print(f"MATCH {n} rows={n_acc[0]}", flush=True)
        else:
            bad += 1
            print(f"DIFF {n}: old(cols={o_names},acc={o_acc[0]}) "
                  f"new(cols={n_names},acc={n_acc[0]})", flush=True)
    print(f"\ndiffs={bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
