#!/bin/bash
# Parallel wrapper around check_oracle.py: splits the Verify output dir's
# query subdirs into N symlinked buckets and runs one comparator per
# bucket (the compare loop is single-threaded pandas canonicalization, so
# at the 40x replica a serial pass takes hours; buckets cut wall time ~N x).
# Usage: check_oracle_par.sh <sfDir> <verifyOutDir> [N]
set -euo pipefail
SF="$1"; OUT="$2"; N="${3:-6}"
WORK=$(mktemp -d)
mapfile -t DIRS < <(find "$OUT" -mindepth 1 -maxdepth 1 -type d | sort)
for i in $(seq 0 $((N-1))); do
  mkdir -p "$WORK/b$i"
  ln -s "$OUT/oracle_sql.json" "$WORK/b$i/oracle_sql.json"
done
i=0
for d in "${DIRS[@]}"; do
  ln -s "$d" "$WORK/b$((i % N))/$(basename "$d")"
  i=$((i+1))
done
PIDS=()
for i in $(seq 0 $((N-1))); do
  python3 "$(dirname "$0")/check_oracle.py" "$SF" "$WORK/b$i" > "$WORK/b$i.log" 2>&1 &
  PIDS+=($!)
done
RC=0
for p in "${PIDS[@]}"; do wait "$p" || RC=1; done
grep -h '^FAIL' "$WORK"/b*.log || true
awk -F'[= ]' '/^passed=/{p+=$2; r+=$4; f+=$6} END{printf "passed=%d rows_only=%d failed=%d\n", p, r, f}' "$WORK"/b*.log
exit $RC
