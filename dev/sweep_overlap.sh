#!/bin/bash
# Overlap the DuckDB oracle sweep with a still-running graft.Verify: every
# minute, compare whichever query outputs have landed (Spark's _SUCCESS
# marker) that aren't yet in the results jsonl. Exits when the Verify JVM
# is gone AND every landed query has a recorded result. Resumable — the
# per-query results jsonl is the source of truth (dev/compare_sweep.py
# skips recorded queries).
#
# Usage: dev/sweep_overlap.sh <sfDir> <verifyOutDir> <resultsJsonl>
#          [verifyPgrepPattern] [skipCsv]
set -uo pipefail
cd "$(dirname "$0")/.."
SF="$1"; OUT="$2"; RES="$3"
PAT="${4:-graft.Verify}"
SKIP="${5:-}"
export COMPARE_THREADS="${COMPARE_THREADS:-8}"
export COMPARE_MEM="${COMPARE_MEM:-24GB}"
# Optional sharding for parallel workers: SWEEP_SHARD="i/n" makes this
# instance claim only query names whose cksum % n == i. Workers share
# one results jsonl (appends; compare_sweep skips recorded names), so
# disjoint shards never race on a query.
SHARD="${SWEEP_SHARD:-0/1}"
SHARD_I="${SHARD%/*}"; SHARD_N="${SHARD#*/}"
# Refuse to start while a graft.Bench is live (round-12: the sweep launched
# two minutes before the bench finished and the committed artifact recorded
# end_load 13.83). Bench writes its PID to target/bench.lock; a stale lock
# (dead PID) is ignored. Override (emergencies only): SWEEP_IGNORE_BENCH=1.
BENCH_LOCK="${SPARK_GRAFT_BENCH_LOCK:-target/bench.lock}"
if [ "${SWEEP_IGNORE_BENCH:-0}" != 1 ]; then
  while [ -f "$BENCH_LOCK" ] && kill -0 "$(cat "$BENCH_LOCK" 2>/dev/null)" 2>/dev/null; do
    echo "[sweep_overlap] graft.Bench live (pid $(cat "$BENCH_LOCK")) — waiting 30s"
    sleep 30
  done
fi
while :; do
  alive=0
  pgrep -f "$PAT" > /dev/null && alive=1
  landed=$(for d in "$OUT"/*/; do
    if [ -e "$d/_SUCCESS" ]; then
      q=$(basename "$d")
      s=$(printf '%s' "$q" | cksum | cut -d' ' -f1)
      [ $((s % SHARD_N)) -eq "$SHARD_I" ] && echo "$q"
    fi
  done | paste -sd, -)
  if [ -n "$landed" ]; then
    python3 dev/compare_sweep.py "$SF" "$OUT" "$RES" \
      --only "$landed" --skip "$SKIP" --timeout 3600
  fi
  if [ "$alive" = 0 ]; then
    echo "[sweep_overlap] verify gone and all landed queries compared; done"
    break
  fi
  sleep 60
done
