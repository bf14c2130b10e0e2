#!/usr/bin/env bash
# Unattended hardware-measurement ladder (BASELINE.md "cont. 2" pendings).
# Runs every bench that was blocked by the round-3 tunnel outage, one at a
# time, tolerating per-run failures (the tunnel can wedge mid-ladder).
# Results: one JSON line per run in $OUT/summary.jsonl; full stderr in
# $OUT/<name>.log.  Usage: tools/bench_ladder.sh [outdir]
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

# 1. headline refresh (fast, warms the shared compile cache)
run headline_100k 2400 --n 100000

# 2. per-tower int8-vs-bf16 embed ladder — the compute-walled towers first
#    (n sized for a >=20 s warm window at each tower's expected rate)
run vit_l14_int8    2400 --embed-only --model vit_l14      --n 40000  --quantize int8
run vit_l14_bf16    1800 --embed-only --model vit_l14      --n 40000
run siglip_int8     2400 --embed-only --model siglip_so400m --n 25000 --quantize int8
run siglip_bf16     1800 --embed-only --model siglip_so400m --n 25000
run vit_l14_336_int8 2400 --embed-only --model vit_l14_336 --n 15000 --quantize int8
run vit_l14_336_bf16 1800 --embed-only --model vit_l14_336 --n 15000
run vit_b16_int8    1800 --embed-only --model vit_b16      --n 100000 --quantize int8
run vit_b16_bf16    1800 --embed-only --model vit_b16      --n 100000
run vit_b32_int8    1800 --embed-only --model vit_b32      --n 200000 --quantize int8
run vit_b32_bf16    1800 --embed-only --model vit_b32      --n 200000
run resnet50_int8   1800 --embed-only --model resnet50     --n 200000 --quantize int8
run resnet50_bf16   1800 --embed-only --model resnet50     --n 200000

# 3. the two pending capacity-tier cluster runs (per-phase profile on)
export IMAGECLUST_CLUSTER_PROFILE=1
run cluster_10m_1024_int8 5400 --cluster-only --n 10000000 --d 1024 --feature-dtype int8
run cluster_10m_512_bf16  5400 --cluster-only --n 10000000 --d 512  --feature-dtype bfloat16
unset IMAGECLUST_CLUSTER_PROFILE

echo "=== ladder done $(date -u +%H:%M:%S)" | tee -a "$OUT/ladder.log"
