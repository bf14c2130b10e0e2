#!/usr/bin/env bash
# Ladder 4: the two 10M big-d tiers that RESOURCE_EXHAUSTED in ladder 3,
# retried with the spill-phase HBM frees + native repair placement
# (commit e308ba5).  Same output conventions as the earlier ladders.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-.bench_ladder}"
mkdir -p "$OUT"

run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== $name: $* (timeout ${tmo}s) $(date -u +%H:%M:%S)" | tee -a "$OUT/ladder.log"
  local line
  line=$(timeout "$tmo" python bench.py "$@" 2>>"$OUT/$name.log")
  local rc=$?
  if [ $rc -eq 0 ] && [ -n "$line" ]; then
    echo "{\"run\": \"$name\", \"result\": $line}" >> "$OUT/summary.jsonl"
    echo "    ok: $line" | tee -a "$OUT/ladder.log"
  else
    echo "{\"run\": \"$name\", \"error\": \"rc=$rc\"}" >> "$OUT/summary.jsonl"
    echo "    FAILED rc=$rc (see $OUT/$name.log)" | tee -a "$OUT/ladder.log"
  fi
}

export IMAGECLUST_CLUSTER_PROFILE=1
run cluster_10m_512_bf16_r3  5400 --cluster-only --n 10000000 --d 512  --feature-dtype bfloat16
run cluster_10m_1024_int8_r3 5400 --cluster-only --n 10000000 --d 1024 --feature-dtype int8
echo "=== ladder4 done $(date -u +%H:%M:%S)" | tee -a "$OUT/ladder.log"
