"""Isolated bucket-merge-phase profiler (the ~35 s phase at 10M x 512).

Times `_all_buckets` alone at a configurable (nb, B, d) with a realistic
skewed count distribution, so merge-loop variants (chunk width, count-sorted
chunking, kernel block shapes) can be measured without paying the full
10M-tier wall each attempt.

    python tools/profile_merges.py --nb 4096 --B 256 --d 512 [--sort]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nb", type=int, default=4096, help="bucket count")
    ap.add_argument("--B", type=int, default=256, help="bucket capacity")
    ap.add_argument("--d", type=int, default=512)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16", "int8"])
    ap.add_argument("--chunk", type=int, default=0,
                    help="override chunk width (0 = engine default)")
    ap.add_argument("--sort", choices=["0", "1"], default="1",
                    help="IMAGECLUST_SORTED_CHUNKS value for this run")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    # set before any engine call site can read it (and before the heavy
    # imports below, so nothing caches the old value)
    import os
    os.environ["IMAGECLUST_SORTED_CHUNKS"] = args.sort

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent
                          / ".jax_cache"))
    import jax.numpy as jnp

    import imageclust_tpu.cluster.sharded as sh

    rng = np.random.default_rng(args.seed)
    nb, B, d = args.nb, args.B, args.d
    n = nb * B
    dt = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
          "int8": jnp.int8}[args.dtype]
    if dt == jnp.int8:
        feats = jnp.asarray(
            rng.integers(-127, 128, (n, d)).astype(np.int8))
    else:
        feats = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32)
                            ).astype(dt)

    # skewed count distribution like a Lloyd fill: clipped lognormal
    counts = np.clip((np.exp(rng.normal(0, 0.35, nb)) * B * 0.75)
                     .astype(np.int32), 3, B)
    targets = np.array([sh._bucket_target(int(c), 3, 6) for c in counts],
                       np.int32)
    bucket_idx = np.zeros((nb, B), np.int32)
    pos = 0
    for i, c in enumerate(counts):
        bucket_idx[i, :c] = np.arange(pos, pos + c) % n
        pos += int(c)

    saved_chunk_width = sh._chunk_width
    if args.chunk:
        sh._chunk_width = lambda *a, **k: args.chunk  # noqa: test override
    try:
        bi = jnp.asarray(bucket_idx)
        ct = jnp.asarray(counts)
        tg = jnp.asarray(targets)

        def run():
            out = sh._all_buckets(feats, bi, ct, tg, 6, 3)
            return np.asarray(out[1])  # step counts: forces a real sync

        t0 = time.perf_counter()
        steps = run()
        print(f"compile+first: {time.perf_counter() - t0:.2f}s "
              f"(total merges {int(steps.sum())})", flush=True)
        walls = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            run()
            walls.append(time.perf_counter() - t0)
        cw = args.chunk or sh._chunk_width(B, d)
        print(f"nb={nb} B={B} d={d} dtype={args.dtype} chunk={cw} "
              f"sort={args.sort}: warm {min(walls):.2f}s "
              f"(all: {[round(w, 2) for w in walls]})")
    finally:
        sh._chunk_width = saved_chunk_width


if __name__ == "__main__":
    main()
