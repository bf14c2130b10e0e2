"""Micro-profiler for the capacity-repair phase in isolation.

Synthesizes kmeans-shaped per-item summaries (assign, own_d, (n,8)
preferences) at an arbitrary tier — repair never reads the feature
matrix, so this isolates the phase the 10M ladder runs measure inside
``constrained_ward_bucketed`` without paying kmeans/merges/spills.

Usage:
    python tools/profile_repair.py --n 10000000 --bucket 256 [--cpu]

``--cpu`` forces the CPU backend (honest host-numpy timings while the
TPU is busy; device transfer legs are then ~free and measured
separately on hardware).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--bucket", type=int, default=256)
    ap.add_argument("--min-size", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import logging

    logging.basicConfig(level=logging.INFO)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from imageclust_tpu.cluster import sharded as sh

    n = args.n
    capacity = args.bucket
    fill = max(args.min_size, int(capacity * 0.75))
    nb = max(1, -(-n // fill))
    rng = np.random.default_rng(args.seed)

    # lognormal bucket popularity: thousands of buckets overflow and a
    # tail runs under min_size — the shape kmeans actually hands repair
    # (zipf was tried first: 5 buckets swallow the job, nothing like
    # Lloyd output)
    w = rng.lognormal(0.0, 0.75, nb)
    p = w / w.sum()
    assign = rng.choice(nb, size=n, p=p).astype(np.int32)
    own_d = rng.random(n, dtype=np.float32)
    pref = np.empty((n, sh._TOP_PREF), np.int32)
    pref[:, 0] = assign
    pref[:, 1:] = rng.integers(0, nb, (n, sh._TOP_PREF - 1), dtype=np.int32)

    counts = np.bincount(assign, minlength=nb)
    print(f"n={n} nb={nb} capacity={capacity} "
          f"over={int((counts > capacity).sum())} "
          f"spill_items={int(np.maximum(counts - capacity, 0).sum())} "
          f"under={int(((counts > 0) & (counts < args.min_size)).sum())}")

    assign_d = jnp.asarray(assign)
    own_d_d = jnp.asarray(own_d)
    pref_d = jnp.asarray(pref)
    np.asarray(assign_d[:1])  # sync the uploads out of the timed region

    for tag in ("cold", "warm"):
        t0 = time.perf_counter()
        buckets = sh._repair_buckets_device(
            assign_d, own_d_d, pref_d, nb, capacity, args.min_size)
        dt = time.perf_counter() - t0
        lens = np.fromiter((len(b) for b in buckets), np.int64)
        print(f"{tag}: repair_total {dt:8.2f}s  buckets={len(buckets)} "
              f"max={lens.max()} min={lens.min()} sum={lens.sum()}")


if __name__ == "__main__":
    main()
