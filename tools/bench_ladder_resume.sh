#!/usr/bin/env bash
# Resume the unattended measurement ladder from where a session abort left
# it (after siglip/vit_l14 runs; vit_l14_336_bf16 was in flight).  Runs the
# remaining tools/bench_ladder.sh entries, then all of bench_ladder2.sh,
# then the ViT-B/32 stage ablation.  Same output conventions as ladder 1.
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

# --- remaining ladder-1 entries ---
run vit_l14_336_bf16 1800 --embed-only --model vit_l14_336 --n 15000
run vit_b16_int8    1800 --embed-only --model vit_b16      --n 100000 --quantize int8
run vit_b16_bf16    1800 --embed-only --model vit_b16      --n 100000
run vit_b32_int8    1800 --embed-only --model vit_b32      --n 200000 --quantize int8
run vit_b32_bf16    1800 --embed-only --model vit_b32      --n 200000
run resnet50_int8   1800 --embed-only --model resnet50     --n 200000 --quantize int8
run resnet50_bf16   1800 --embed-only --model resnet50     --n 200000

export IMAGECLUST_CLUSTER_PROFILE=1
run cluster_10m_1024_int8 5400 --cluster-only --n 10000000 --d 1024 --feature-dtype int8
run cluster_10m_512_bf16  5400 --cluster-only --n 10000000 --d 512  --feature-dtype bfloat16

# --- ladder 2 (capacity tiers via residency dtypes) ---
run cluster_2m_1000_bf16 3600 --cluster-only --n 2000000 --d 1000 --feature-dtype bfloat16
run cluster_1m_1000_int8 2400 --cluster-only --n 1000000 --d 1000 --feature-dtype int8
run cluster_1m_1000_bf16 2400 --cluster-only --n 1000000 --d 1000 --feature-dtype bfloat16
unset IMAGECLUST_CLUSTER_PROFILE
run chain_100k_1000 1800 --cluster-only --n 100000 --d 1000 --engine chain

# --- ViT-B/32 stage ablation (where does the 39% headroom hide) ---
echo "=== vit_ablation $(date -u +%H:%M:%S)" | tee -a "$OUT/ladder.log"
timeout 1800 python tools/vit_ablation.py > "$OUT/vit_ablation.out" 2> "$OUT/vit_ablation.log" \
  && echo "    ok (see $OUT/vit_ablation.out)" | tee -a "$OUT/ladder.log" \
  || echo "    FAILED (see $OUT/vit_ablation.log)" | tee -a "$OUT/ladder.log"

echo "=== resume ladder done $(date -u +%H:%M:%S)" | tee -a "$OUT/ladder.log"
