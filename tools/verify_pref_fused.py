"""On-chip verification of the fused pref-topk kernel (verify recipe,
library surface): 1) engine-level A/B — bucketed partitions must be
identical with IMAGECLUST_PREF_FUSED=0 vs 1 in need-only mode on skewed
blobs; 2) microbench at the 10M tier's geometry (k=52,084, d=512, bf16)
vs the XLA tile path, s per million need-rows."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

os.environ["IMAGECLUST_PREF_NEED_ONLY"] = "1"

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

import imageclust_tpu.cluster.sharded as sh

rng = np.random.default_rng(0)

# --- 1) engine-level A/B on skewed blobs (forces spills + dissolves) ---
centers = rng.normal(size=(40, 32)).astype(np.float32) * 8
sizes = rng.integers(2, 4000, size=40)
x = np.concatenate([
    c + rng.normal(size=(s, 32)).astype(np.float32) * 0.5
    for c, s in zip(centers, sizes)])
x = x[rng.permutation(len(x))]
print(f"engine A/B n={len(x)}", flush=True)
os.environ["IMAGECLUST_PREF_FUSED"] = "0"
ref = sh.constrained_ward_bucketed(x, min_size=3, max_size=6,
                                   bucket_size=256)
os.environ["IMAGECLUST_PREF_FUSED"] = "1"
got = sh.constrained_ward_bucketed(x, min_size=3, max_size=6,
                                   bucket_size=256)
same = got.cluster_map == ref.cluster_map and got.dropped == ref.dropped
n_same = sum(1 for k_ in ref.cluster_map
             if got.cluster_map.get(k_) == ref.cluster_map[k_])
print(f"engine A/B: clusters {len(ref.cluster_map)} vs "
      f"{len(got.cluster_map)}, identical={same} "
      f"({n_same}/{len(ref.cluster_map)} clusters equal)", flush=True)

if "--ab-only" in sys.argv:
    sys.exit(0 if same else 1)

# --- 2) microbench at tier geometry ---
k, d, m = 52084, 512, 1 << 20  # 1M need rows
n = 4 << 20
feats = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32)
                    ).astype(jnp.bfloat16)
cents = jnp.asarray(rng.normal(size=(k, d)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, n, size=m).astype(np.int32))

blk = sh._kmeans_block(n, k, sh._KMEANS_BLOCK)
m_tile = -(-m // blk) * blk
idx_tile = jnp.zeros(m_tile, jnp.int32).at[:m].set(idx)

def run_tile():
    r = sh._pref_need_rows(feats, cents, idx_tile, kk=8, block=blk,
                           as_u16=True)
    np.asarray(r)
    return r

def run_fused():
    r = sh._pref_need_rows_fused(feats, cents, idx, kk=8, block_c=512,
                                 as_u16=True, interpret=False)
    np.asarray(r)
    return r

for name, fn in (("fused", run_fused), ("tile", run_tile)):
    t0 = time.perf_counter()
    r0 = fn()
    print(f"{name} cold: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    r1 = fn()
    dt = time.perf_counter() - t0
    print(f"{name} warm: {dt:.2f}s = {dt / (m / 1e6):.2f} s/M rows",
          flush=True)

sys.exit(0 if same else 1)
