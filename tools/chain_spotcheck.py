"""Chain-vs-greedy partition spot-check on the chip (VERDICT r4 item 4).

The suite already fuzz-pins ``constrained_ward_chain`` == ``constrained_ward``
on tie-free floats at small n (tests/test_chain.py TestChainMatchesGreedy) on
the forced-CPU backend; this tool runs ONE larger instance on the real TPU —
the hardware whose MXU reduction order the equivalence claim actually has to
survive — at a subsample size where the greedy engine's O(n^2) matrix still
fits. Companion to the ``bench.py --cluster-only --engine chain`` 1M tier row.

Usage: python tools/chain_spotcheck.py [--n 8192] [--d 512]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# repo-root import without PYTHONPATH (setting PYTHONPATH breaks the axon
# TPU plugin registration on this box — run plainly from anywhere instead)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=8192)
    p.add_argument("--d", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (sitecustomize preimports "
                        "jax on this box, so the env var is not enough)")
    args = p.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from imageclust_tpu.cluster.chain import constrained_ward_chain
    from imageclust_tpu.cluster.ward import constrained_ward
    from imageclust_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    x = (np.random.default_rng(args.seed)
         .standard_normal((args.n, args.d)).astype(np.float32))

    t0 = time.perf_counter()
    ref = constrained_ward(x, min_size=3, max_size=6)
    t_greedy = time.perf_counter() - t0
    t0 = time.perf_counter()
    # reassign_dropped=False: the exact engine keeps the reference's drop
    # semantics, so the chain run must too for partition+dropped equality
    got = constrained_ward_chain(x, min_size=3, max_size=6,
                                 reassign_dropped=False)
    t_chain = time.perf_counter() - t0

    part_ref = {frozenset(m) for m in ref.cluster_map.values()}
    part_got = {frozenset(m) for m in got.cluster_map.values()}
    same = part_ref == part_got
    # on continuous gaussian data near-ties can legitimately diverge
    # (see the precision scope in constrained_ward_chain's docstring);
    # report the overlap so a near-tie blip reads differently from a bug
    inter = len(part_ref & part_got)
    print(json.dumps({
        "n": args.n, "d": args.d,
        "identical_partition": same,
        "clusters_greedy": len(part_ref), "clusters_chain": len(part_got),
        "shared_clusters": inter,
        "same_dropped": set(got.dropped) == set(ref.dropped),
        "greedy_s": round(t_greedy, 2), "chain_s": round(t_chain, 2),
    }), flush=True)
    return 0 if same else 1


if __name__ == "__main__":
    sys.exit(main())
