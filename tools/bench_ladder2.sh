#!/usr/bin/env bash
# Phase-2 ladder: capacity tiers newly reachable via residency dtypes.
# Run after tools/bench_ladder.sh. Same output conventions.
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
# the tier that used to die (f32: AOT-helper trip at 8 GB features) — bf16
# residency is 4 GB and inside the measured envelope
run cluster_2m_1000_bf16 3600 --cluster-only --n 2000000 --d 1000 --feature-dtype bfloat16
# mid-tier residency comparison at the pipeline's real feature width
run cluster_1m_1000_int8 2400 --cluster-only --n 1000000 --d 1000 --feature-dtype int8
run cluster_1m_1000_bf16 2400 --cluster-only --n 1000000 --d 1000 --feature-dtype bfloat16
# chain-engine refresh at the round-3 headline shape
unset IMAGECLUST_CLUSTER_PROFILE
run chain_100k_1000 1800 --cluster-only --n 100000 --d 1000 --engine chain

echo "=== ladder2 done $(date -u +%H:%M:%S)" | tee -a "$OUT/ladder.log"
