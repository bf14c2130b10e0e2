"""Nearest-neighbor-chain constrained Ward: exact greedy semantics in
O(n*d) memory — no n x n distance matrix.

The exact engine (:mod:`imageclust_tpu.cluster.ward`) reproduces the
reference's greedy merge loop (clustering.go:220-246) against a dense Ward
matrix: O(n^2) HBM and one full-matrix pass per merge. That caps exact mode
at a few thousand items; past ``exact_limit`` the pipeline falls back to the
bucketed engine, which approximates the global merge ORDER.

This module removes the approximation at the 100k tier. Ward linkage is
*reducible* (d(i∪j, k) >= min(d(i,k), d(j,k))), so the nearest-neighbor-chain
algorithm produces the SAME dendrogram as the greedy global-argmin loop
whenever merge distances are distinct — and the reference's maxSize
"poisoning" (clustering.go:228-234) PRESERVES reducibility, because
infeasibility is monotone: cluster sizes only grow, so a pair that is ever
oversized stays oversized (infinite distance only ever increases). Greedy
also realizes that dendrogram in non-decreasing height order, so "greedy
stopped at k clusters" == "the n-k smallest-height dendrogram nodes": we run
the chain to exhaustion on device and CUT at the target count on the host.

TPU shape: one jitted ``lax.while_loop`` whose per-iteration work is a
single (n, d) streamed pass (distances from the chain head to every
centroid) — O(n*d) memory, O(n*d) per step, ~3n steps total. n=100k never
materializes the 40 GB matrix the exact engine would need.

Same guarantee domain as the Lance-Williams mode (CLAUDE.md): identical to
the greedy engine wherever merge distances are distinct; mathematically TIED
distances may resolve differently (the greedy loop uses the Go scan-order
tie-break; the chain discovers merges in a different order). This is a SCALE
mode, not the parity mode.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from imageclust_tpu.cluster.ward import (
    ClusterResult,
    _BIG_I32,
    _leaf_indices,
    _pad_len,
    calculate_optimal_clusters,
)

__all__ = ["constrained_ward_chain"]


@jax.jit
def _chain_start(x: jax.Array, n_items: jax.Array):
    """Build the chain loop's device carry from (n_pad, d) padded features."""
    n_pad, _ = x.shape
    f32 = jnp.float32
    i32 = jnp.int32
    idx = jnp.arange(n_pad, dtype=i32)
    active0 = idx < n_items
    x = x.astype(f32)
    return (
        x,                                                   # cents
        jnp.where(active0, 1, 0).astype(i32),                # sizes
        jnp.where(active0, idx, _BIG_I32 - n_pad + idx),     # births
        active0,                                             # active
        ~active0,                                            # blocked
        jnp.zeros((n_pad + 1,), i32),                        # chain
        i32(0),                                              # chain_len
        jnp.zeros((n_pad, 3), i32),                          # log
        jnp.zeros((n_pad,), f32),                            # heights
        i32(0),                                              # step
        n_items.astype(i32),                                 # counter
        n_items.astype(i32),                                 # n_unblocked
        i32(0),                                              # segment iter
    )


# The carry is donated: the loop state (up to (n,d)+ hundreds of MB) is
# updated in place across segments instead of double-buffering in HBM.
@partial(jax.jit, donate_argnums=(0,))
def _chain_segment(carry, max_size: jax.Array, seg_iters: jax.Array):
    """Advance the NN-chain by at most ``seg_iters`` iterations.

    The loop is SEGMENTED rather than one unbounded device program: a full
    run is ~3n iterations, and a single while_loop executing for minutes
    trips device-runtime watchdogs (observed: the TPU worker kills a ~4 min
    program at n=100k, d=1000). The carry stays resident in HBM between
    segments; the host re-dispatches until no feasible pair remains, paying
    one scalar sync per segment.

    Merges appear in the log in CHAIN order — not height order; the host cut
    sorts by (height, log index), which is guaranteed child-before-parent
    because a parent's height is >= its children's (reducibility => no
    inversions) and a parent is always logged after its children.
    """
    n_pad = carry[0].shape[0]
    f32 = jnp.float32
    i32 = jnp.int32
    idx = jnp.arange(n_pad, dtype=i32)

    def body(carry):
        (cents, sizes, births, active, blocked, chain, clen, log, heights,
         step, counter, n_unb, it) = carry

        # seed an empty chain with the lowest-index unblocked cluster, then
        # fall through to the distance step in the SAME iteration
        need_seed = clen == 0
        first = jnp.argmax(active & ~blocked).astype(i32)
        chain = jnp.where(need_seed, chain.at[0].set(first), chain)
        clen = jnp.where(need_seed, i32(1), clen)

        top = chain[clen - 1]
        prev = chain[jnp.maximum(clen - 2, 0)]
        has_prev = clen >= 2

        # Ward distance from the chain head to every cluster, one streamed
        # (n, d) pass. Direct diff-square-sum (not norm+gram): matches the
        # greedy engine's "centroid" update rounding as closely as possible.
        c_top = cents[top]
        s_top = sizes[top]
        s_top_f = s_top.astype(f32)
        diff = cents - c_top[None, :]
        d2 = jnp.sum(diff * diff, axis=1)
        s_j = sizes.astype(f32)
        w = (s_top_f * s_j / (s_top_f + s_j)) * d2
        feas = active & (idx != top) & ((s_top + sizes) <= max_size)
        E = jnp.where(feas, w, jnp.inf)
        dmin = jnp.min(E)
        found = jnp.isfinite(dmin)

        # reciprocal-NN test with the standard prefer-prev tie-break (keeps
        # the chain acyclic); otherwise first-index argmin for determinism
        prev_is_min = has_prev & found & (E[prev] <= dmin)
        nn = jnp.where(prev_is_min, prev, jnp.argmin(E).astype(i32))

        do_merge = prev_is_min
        do_block = ~found
        do_extend = found & ~prev_is_min

        # --- merge top & prev (computed unconditionally, gated below) ---
        keep = jnp.minimum(top, prev)
        drop = jnp.maximum(top, prev)
        s_a = sizes[top]
        s_b = sizes[prev]
        s_new = s_a + s_b
        c_new = (s_a.astype(f32) * cents[top]
                 + s_b.astype(f32) * cents[prev]) / s_new.astype(f32)
        bhi = jnp.maximum(births[top], births[prev])
        blo = jnp.minimum(births[top], births[prev])

        cents = jnp.where(do_merge, cents.at[keep].set(c_new), cents)
        sizes = jnp.where(
            do_merge, sizes.at[keep].set(s_new).at[drop].set(0), sizes)
        births = jnp.where(do_merge, births.at[keep].set(counter), births)
        active = jnp.where(do_merge, active.at[drop].set(False), active)
        log = jnp.where(
            do_merge, log.at[step].set(jnp.stack([bhi, blo, counter])), log)
        heights = jnp.where(do_merge, heights.at[step].set(dmin), heights)

        # --- block: top has no feasible partner, permanently (sizes only
        # grow) — retire it from chain seeding; it stays an output cluster
        blocked = jnp.where(do_block, blocked.at[top].set(True), blocked)

        # --- extend: push the nearer neighbor
        chain = jnp.where(do_extend, chain.at[clen].set(nn), chain)

        clen = jnp.where(do_merge, clen - 2,
                         jnp.where(do_block, clen - 1, clen + 1))
        counter = jnp.where(do_merge, counter + 1, counter)
        step = jnp.where(do_merge, step + 1, step)
        n_unb = n_unb - jnp.where(do_merge | do_block, 1, 0).astype(i32)

        return (cents, sizes, births, active, blocked, chain, clen, log,
                heights, step, counter, n_unb, it + 1)

    def cond(carry):
        n_unb, it = carry[11], carry[12]
        return (n_unb >= 2) & (it < seg_iters)

    return jax.lax.while_loop(cond, body, (*carry[:12], jnp.int32(0)))


# ---------------------------------------------------------------------------
# Batched reciprocal-NN rounds: the parallel form of the chain (the default
# single-device path). The sequential chain advances one link per (n, d)
# pass; this advances THOUSANDS of merges per pass. Correctness rests on
# the same reducibility argument as the chain itself (module docstring):
# merging any set of MUTUAL nearest-neighbor pairs, in any order, yields
# the same dendrogram as the greedy global-argmin loop wherever merge
# distances are distinct — and mutual-NN pairs are automatically disjoint
# (a shared member would need two distinct equidistant nearest neighbors,
# i.e. a tie). maxSize poisoning again preserves reducibility because
# infeasibility is monotone.
#
# The nearest-neighbor state is CACHED across rounds with exact
# invalidation (the measured v1 recomputed every row's NN every round:
# 59 full (m, m, d) passes = 57 of 64 s at 100k x 1000). d(i, j) for
# untouched i, j never changes and sizes only grow, so after a round
# merges p pairs the cache is repaired exactly by:
#   * full recompute for rows whose cached partner was CONSUMED (their
#     cached value may be stale-small) and for the p new clusters
#     (~3p rows: the NN graph has average in-degree 1),
#   * a cheap (n, p) update pass minimizing every other row against the
#     p new clusters (the only candidates that can have gotten closer).
# Per round that is O((4p) * n * d) instead of O(m^2 d); rows with no
# remaining feasible partner surface as +inf on recompute and retire
# permanently at the next apply.
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("block",))
def _nn_rows(cents, sizes, unblocked, r_idx, r_valid, max_size, nn, nnd,
             block):
    """Full nearest-feasible-partner recompute for the rows listed in
    ``r_idx`` (padded; ``r_valid`` masks real entries), scanning ALL
    columns in (r_pad, block) tiles. Distances via the Gram expansion on
    the MXU (HIGHEST precision: f32-accurate so near-tie ordering matches
    the direct diff-square-sum within ulps). Column blocks ascend, and a
    later equal distance never replaces an earlier one — global
    first-index argmin semantics. Results scatter into the (n_pad,)
    nn/nnd cache."""
    n_pad, d = cents.shape
    f32 = jnp.float32
    i32 = jnp.int32
    rows = cents[r_idx]
    rsz = sizes[r_idx]
    rnorm = jnp.sum(rows.astype(f32) * rows.astype(f32), axis=1)
    rs_f = rsz.astype(f32)
    n_blocks = n_pad // block

    def blk(carry, ci):
        bd, bn = carry
        c0 = ci * block
        cblock = jax.lax.dynamic_slice_in_dim(cents, c0, block, 0)
        csz = jax.lax.dynamic_slice_in_dim(sizes, c0, block, 0)
        cunb = jax.lax.dynamic_slice_in_dim(unblocked, c0, block, 0)
        cnorm = jnp.sum(cblock.astype(f32) * cblock.astype(f32), axis=1)
        g = jax.lax.dot_general(
            rows, cblock, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=f32,
        )
        d2 = jnp.maximum(rnorm[:, None] + cnorm[None, :] - 2.0 * g, 0.0)
        cs_f = csz.astype(f32)
        w = (rs_f[:, None] * cs_f[None, :]
             / (rs_f[:, None] + cs_f[None, :])) * d2
        gidx = c0 + jnp.arange(block, dtype=i32)
        feas = (cunb[None, :] & r_valid[:, None]
                & (r_idx[:, None] != gidx[None, :])
                & ((rsz[:, None] + csz[None, :]) <= max_size))
        E = jnp.where(feas, w, jnp.inf)
        cbd = jnp.min(E, axis=1)
        cbn = gidx[jnp.argmin(E, axis=1)]
        better = (cbd < bd) | ((cbd == bd) & (cbn < bn))
        return (jnp.where(better, cbd, bd),
                jnp.where(better, cbn, bn)), None

    carry = (jnp.full(r_idx.shape[0], jnp.inf, f32),
             jnp.full(r_idx.shape[0], _BIG_I32, i32))
    (bd, bn), _ = jax.lax.scan(
        blk, carry, jnp.arange(n_blocks, dtype=i32))
    tgt = jnp.where(r_valid, r_idx, n_pad)
    nn = nn.at[tgt].set(bn, mode="drop")
    nnd = nnd.at[tgt].set(bd, mode="drop")
    return nn, nnd


@partial(jax.jit, static_argnames=("block",))
def _nn_update(cents, sizes, unblocked, new_idx, new_valid, max_size, nn,
               nnd, block):
    """Cache update pass: minimize every row's cached partner against the
    round's NEW clusters only — an (n_pad, p_pad) tile sweep. ``new_idx``
    ascends, so within-tile first-position argmin is smallest-global-index;
    a new distance replaces the cache only if strictly smaller (or equal
    with a smaller index — deterministic on ties, which are outside the
    equivalence guarantee anyway)."""
    n_pad, d = cents.shape
    f32 = jnp.float32
    i32 = jnp.int32
    newc = cents[new_idx]
    newsz = sizes[new_idx]
    nnorm = jnp.sum(newc.astype(f32) * newc.astype(f32), axis=1)
    ns_f = newsz.astype(f32)
    n_blocks = n_pad // block

    def blk(carry, bi):
        nn, nnd = carry
        r0 = bi * block
        rows = jax.lax.dynamic_slice_in_dim(cents, r0, block, 0)
        rsz = jax.lax.dynamic_slice_in_dim(sizes, r0, block, 0)
        runb = jax.lax.dynamic_slice_in_dim(unblocked, r0, block, 0)
        rnn = jax.lax.dynamic_slice_in_dim(nn, r0, block, 0)
        rnnd = jax.lax.dynamic_slice_in_dim(nnd, r0, block, 0)
        rnorm = jnp.sum(rows.astype(f32) * rows.astype(f32), axis=1)
        g = jax.lax.dot_general(
            rows, newc, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=f32,
        )
        d2 = jnp.maximum(rnorm[:, None] + nnorm[None, :] - 2.0 * g, 0.0)
        rs_f = rsz.astype(f32)
        w = (rs_f[:, None] * ns_f[None, :]
             / (rs_f[:, None] + ns_f[None, :])) * d2
        gidx = r0 + jnp.arange(block, dtype=i32)
        feas = (new_valid[None, :] & runb[:, None]
                & (gidx[:, None] != new_idx[None, :])
                & ((rsz[:, None] + newsz[None, :]) <= max_size))
        E = jnp.where(feas, w, jnp.inf)
        bd = jnp.min(E, axis=1)
        bn = new_idx[jnp.argmin(E, axis=1)]
        better = (bd < rnnd) | ((bd == rnnd) & (bn < rnn))
        nn = jax.lax.dynamic_update_slice_in_dim(
            nn, jnp.where(better, bn, rnn), r0, 0)
        nnd = jax.lax.dynamic_update_slice_in_dim(
            nnd, jnp.where(better, bd, rnnd), r0, 0)
        return (nn, nnd), None

    (nn, nnd), _ = jax.lax.scan(
        blk, (nn, nnd), jnp.arange(n_blocks, dtype=i32))
    return nn, nnd


def _compact_mask(mask, cap: int):
    """First-``cap`` set rows of a boolean mask as a fixed-shape index
    list (ascending; overflow rows stay set for a later call). Returns
    (idx (cap,), valid (cap,), processed-mask)."""
    n_pad = mask.shape[0]
    i32 = jnp.int32
    ar = jnp.arange(n_pad, dtype=i32)
    ordr = jnp.cumsum(mask.astype(i32)) - 1
    slot = jnp.where(mask & (ordr < cap), ordr, cap)
    buf = jnp.full(cap + 1, n_pad, i32).at[slot].set(ar)[:cap]
    valid = buf < n_pad
    falsev = jnp.zeros(n_pad + 1, bool)
    processed = falsev.at[jnp.where(valid, buf, n_pad)].set(True)[:n_pad]
    return jnp.minimum(buf, n_pad - 1), valid, processed


def _apply_pairs_core(sizes, births, active, blocked, log, heights,
                      step, counter, nn, pair_idx, pair_valid, ca, cb):
    """Replicated portion of one round's merge application — everything
    except reading/writing centroid rows. The caller supplies the merging
    rows' centroids ``ca``/``cb`` (a direct gather single-device; a psum
    gather on the mesh) and scatters the returned ``c_new`` at ``keep_t``
    (drop-masked) itself. ``pair_idx`` lists pair-head rows ascending;
    counter stamps follow that order. Also returns the masks the cache
    repair needs: the new unblocked set, the recompute set (new clusters
    + rows whose cached partner was consumed — their cached value may be
    stale-small), and the new-cluster mask for the update pass."""
    n_pad = sizes.shape[0]
    i32 = jnp.int32
    f32 = jnp.float32

    ga = pair_idx
    gb = jnp.take(nn, ga)
    keep = jnp.minimum(ga, gb)
    dropg = jnp.maximum(ga, gb)
    sa = jnp.take(sizes, ga)
    sb = jnp.take(sizes, gb)
    s_new = sa + sb
    c_new = (sa.astype(f32)[:, None] * ca + sb.astype(f32)[:, None] * cb) \
        / jnp.maximum(s_new, 1).astype(f32)[:, None]
    # logged height recomputed by direct diff-square-sum — the same
    # rounding path as the sequential chain segment
    dvec = ca - cb
    d2 = jnp.sum(dvec * dvec, axis=1)
    h = (sa.astype(f32) * sb.astype(f32)
         / jnp.maximum(s_new, 1).astype(f32)) * d2
    ba = jnp.take(births, ga)
    bb = jnp.take(births, gb)
    bhi = jnp.maximum(ba, bb)
    blo = jnp.minimum(ba, bb)
    rank = jnp.cumsum(pair_valid.astype(i32)) - 1
    ctr = counter + rank

    keep_t = jnp.where(pair_valid, keep, n_pad)
    drop_t = jnp.where(pair_valid, dropg, n_pad)
    sizes = sizes.at[keep_t].set(s_new, mode="drop").at[drop_t].set(
        0, mode="drop")
    births = births.at[keep_t].set(ctr, mode="drop")
    active = active.at[drop_t].set(False, mode="drop")
    pos = jnp.where(pair_valid, step + rank, n_pad)
    log = log.at[pos].set(jnp.stack([bhi, blo, ctr], axis=1), mode="drop")
    heights = heights.at[pos].set(h, mode="drop")

    p = jnp.sum(pair_valid.astype(i32))
    unblocked = active & ~blocked
    falsev = jnp.zeros(n_pad + 1, bool)
    changed = falsev.at[keep_t].set(True).at[drop_t].set(True)[:n_pad]
    is_keep = falsev.at[keep_t].set(True)[:n_pad]
    # stale detection uses the PRE-update cache: a consumed partner means
    # the cached value may be smaller than any live distance
    recompute = unblocked & (jnp.take(changed, nn) | is_keep)
    return (c_new, keep_t, sizes, births, active, log, heights,
            step + p, counter + p, unblocked, recompute, is_keep, p)


def _apply_pairs(cents, sizes, births, active, blocked, log, heights,
                 step, counter, nn, pair_idx, pair_valid):
    """Single-device merge application: gather the merging rows' centroids,
    run the replicated core, scatter the merged centroids back."""
    ca = jnp.take(cents, pair_idx, axis=0)
    cb = jnp.take(cents, jnp.take(nn, pair_idx), axis=0)
    (c_new, keep_t, sizes, births, active, log, heights, step, counter,
     unblocked, recompute, is_keep, p) = _apply_pairs_core(
        sizes, births, active, blocked, log, heights, step, counter, nn,
        pair_idx, pair_valid, ca, cb)
    cents = cents.at[keep_t].set(c_new, mode="drop")
    return (cents, sizes, births, active, blocked, log, heights,
            step, counter, unblocked, recompute, is_keep, p)


@partial(jax.jit,
         static_argnames=("r_cap", "p_cap", "blk_r", "blk_u", "seg_rounds"),
         donate_argnums=(0,))
def _rnn_segment(state, max_size, r_cap, p_cap, blk_r, blk_u, seg_rounds):
    """Up to ``seg_rounds`` rounds in ONE device program — the host never
    uploads index lists or pulls per-round masks (through a remote
    transport every such exchange costs a full round trip; the v2 loop
    spent more time on ~8 exchanges/round than on compute, and one
    program per round still paid ~half the wall in round dispatch).
    Fixed shapes via caps; each round:

    * while any rows are PENDING recompute, process the first ``r_cap``
      of them with a full-column scan and clear them (overflow waits for
      the next round);
    * otherwise select reciprocal pairs from the (now fully valid) cache,
      merge the first ``p_cap`` (deferring mutual pairs is exact — any
      subset of reciprocal pairs may merge), retire partnerless rows,
      minimize the cache against the new clusters, and mark the
      invalidated rows pending.

    The loop stops on a DONE flag: fewer than 2 unblocked clusters, or a
    merge round (nothing pending) that merged nothing — the fallback
    always merges a feasible pair, so that means every row retired. The
    carry is donated: the (n, d) centroid matrix updates in place across
    segments. One scalar pull (the done flag) per segment."""
    i32 = jnp.int32

    def round_fn(st):
        (cents, sizes, births, active, blocked, log, heights, step,
         counter, pending, nn, nnd, done, it) = st
        unb = active & ~blocked
        r_count = jnp.sum(pending.astype(i32))

        def recompute_branch(args):
            (cents, sizes, births, active, blocked, log, heights, step,
             counter, pending, nn, nnd) = args
            r_idx, r_val, processed = _compact_mask(pending, r_cap)
            nn, nnd = _nn_rows(cents, sizes, unb, r_idx, r_val, max_size,
                               nn, nnd, blk_r)
            return (cents, sizes, births, active, blocked, log, heights,
                    step, counter, pending & ~processed, nn, nnd,
                    jnp.int32(1))

        def merge_branch(args):
            (cents, sizes, births, active, blocked, log, heights, step,
             counter, pending, nn, nnd) = args
            n_pad = nn.shape[0]
            ar = jnp.arange(n_pad, dtype=i32)
            finite = jnp.isfinite(nnd) & unb
            blocked = blocked | (unb & ~finite)
            mutual = finite & (jnp.take(nn, nn) == ar) & (ar < nn)
            any_mutual = jnp.any(mutual)
            any_finite = jnp.any(finite)
            i_star = jnp.argmin(jnp.where(finite, nnd, jnp.inf)).astype(i32)
            mutual = jnp.where(~any_mutual & any_finite, ar == i_star,
                               mutual)
            p_idx, p_val, _ = _compact_mask(mutual, p_cap)
            (cents, sizes, births, active, blocked, log, heights, step,
             counter, unb2, recompute, is_keep, p) = _apply_pairs(
                cents, sizes, births, active, blocked, log, heights, step,
                counter, nn, p_idx, p_val)
            q_idx, q_val, _ = _compact_mask(is_keep, p_cap)
            nn, nnd = _nn_update(cents, sizes, unb2, q_idx, q_val, max_size,
                                 nn, nnd, blk_u)
            return (cents, sizes, births, active, blocked, log, heights,
                    step, counter, recompute, nn, nnd, p)

        args = (cents, sizes, births, active, blocked, log, heights, step,
                counter, pending, nn, nnd)
        out = jax.lax.cond(r_count > 0, recompute_branch, merge_branch,
                           args)
        (cents, sizes, births, active, blocked, log, heights, step,
         counter, pending, nn, nnd, merged) = out
        alive = jnp.sum((active & ~blocked).astype(i32))
        done = (alive < 2) | ((r_count == 0) & (merged == 0))
        return (cents, sizes, births, active, blocked, log, heights, step,
                counter, pending, nn, nnd, done, it + 1)

    def cond(st):
        return ~st[12] & (st[13] < seg_rounds)

    out = jax.lax.while_loop(
        cond, round_fn, (*state, jnp.bool_(False), jnp.int32(0)))
    return out[:12], out[12]


# per-call row caps: big enough that a typical round's invalidation set
# (~4x the merged pairs) fits in one call, small enough that the padded
# recompute pass stays cheap
_R_CAP = 8192
_P_CAP = 4096


def _pad_features(x: jax.Array, n_pad: int, d_pad: int) -> jax.Array:
    """(n, d) features -> fresh f32 (n_pad, d_pad) zero-padded buffer.

    ONE allocation (``jnp.pad``), never a view of the caller's features:
    the segment loops DONATE their carry, and an aliasing no-op (astype
    f32 of f32, zero-width pad) would let donation delete the array the
    spill pass — and possibly the caller — still needs. Padding is done
    here in a single fused op because chained row-pad + column-pad +
    defensive-copy materialized 3 transient copies of a 4 GB matrix at
    n=1M, d=1000 and OOM'd the chip.

    Zero columns are BIT-EXACT for every distance: they contribute
    exactly 0.0 to norms and dot products and stay zero through centroid
    averaging. Lane-aligning d measured 1.9x on the HIGHEST-precision
    matmuls that dominate the engine — d=1000 runs 13.7 TF/s, d=1024
    26.5, and any multiple of 128 (1152, 1280) hits the same fast path.
    """
    n, d = x.shape
    if n == n_pad and d == d_pad:
        return jnp.array(x, dtype=jnp.float32, copy=True)
    return jnp.pad(x.astype(jnp.float32),
                   ((0, n_pad - n), (0, d_pad - d)))


def _rnn_loop(x: jax.Array, n_items: int, max_size: int):
    """Run reciprocal-NN rounds to exhaustion with the cached-NN repair
    scheme, segmented into multi-round device programs
    (:func:`_rnn_segment`). ``x`` is the UNPADDED (n, d) feature matrix;
    all padding happens here in one op. Returns (log, heights, steps) in
    the same format as :func:`_chain_loop` — the host cut is shared."""
    _, d = x.shape
    n_pad0 = _pad_len(n_items)
    # Column scans tile at a FIXED good block and the state pads to a
    # multiple of it. (The first cut derived the block from n_pad's
    # factorization — a 128-aligned n like 100096 = 2^8 * 391 forced
    # 256-wide blocks, i.e. 391 tiny matmuls per pass, and measured 28 s
    # where the arithmetic floor is ~2 s.) 2048 columns x 1000 features is
    # deep into the MXU-efficient regime; padding waste is < 2%.
    blk = min(2048, n_pad0)  # n_pad0 is 128-aligned, so small n = 1 block
    n_pad = ((n_pad0 + blk - 1) // blk) * blk
    d_pad = ((d + 127) // 128) * 128
    i32 = jnp.int32
    f32 = jnp.float32
    idx0 = jnp.arange(n_pad, dtype=i32)
    active = idx0 < n_items
    state = (
        _pad_features(x, n_pad, d_pad),                    # cents
        active.astype(i32),                                # sizes
        jnp.where(active, idx0, _BIG_I32 - n_pad + idx0),  # births
        active,                                            # active
        ~active,                                           # blocked
        jnp.zeros((n_pad, 3), i32),                        # log
        jnp.zeros((n_pad,), f32),                          # heights
        jnp.int32(0),                                      # step
        jnp.int32(n_items),                                # counter
        jnp.array(active, copy=True),  # pending (all; distinct buffer —
                                       # the same array twice in a donated
                                       # carry is an XLA error
        jnp.zeros(n_pad, i32),                             # nn
        jnp.full(n_pad, jnp.inf, f32),                     # nnd
    )
    ms = jnp.int32(max_size)
    r_cap = min(_R_CAP, n_pad)
    p_cap = min(_P_CAP, n_pad)
    blk_r = blk_u = blk
    # rounds bound: every round either clears >= min(r_cap, pending)
    # pending rows or merges/blocks >= 1 cluster
    max_rounds = 4 * n_items + 2 * (n_items // r_cap + 2) + 8
    # segment length: ~10 s of device time per program (a multi-minute
    # program trips the TPU worker watchdog; too-short segments pay a
    # host round trip per round). Worst-case round cost is the bigger of
    # the recompute and update matmul passes.
    flops_round = max(r_cap, p_cap) * n_pad * d_pad * 2
    seg_rounds = int(max(8, min(4096, 10.0 / (flops_round / 5e13 + 1e-3))))
    max_segments = max_rounds // seg_rounds + 2
    for _ in range(max_segments):
        state, done = _rnn_segment(
            tuple(state), ms, r_cap=r_cap, p_cap=p_cap, blk_r=blk_r,
            blk_u=blk_u, seg_rounds=seg_rounds)
        if bool(np.asarray(done)):  # one scalar pull per segment
            break
    else:  # pragma: no cover — every round merges >= 1 or blocks the rest
        raise RuntimeError(
            f"reciprocal-NN rounds did not converge (n={n_items})")
    return state[5], state[6], state[7]


# ---------------------------------------------------------------------------
# Mesh form of the reciprocal-NN rounds: the centroid matrix row-shards
# over the mesh's 'data' axis; every other state array is replicated (all
# O(n) bytes — the (n, d) matrix is the only thing worth sharding). The
# round logic is IDENTICAL to the single-device engine; only the three
# centroid touches change:
#   * row gathers (recompute rows, merging pairs, new clusters) become a
#     psum of owner-contributed rows — exact: one owner row + zeros;
#   * the recompute pass scans only LOCAL column blocks, and the
#     per-device (best, index) results combine across devices with the
#     same (smaller distance, then smaller index) rule the single-device
#     scan applies across its column blocks — device order IS ascending
#     global column order, so first-index argmin semantics survive;
#   * the update pass minimizes only LOCAL rows' cache entries, and the
#     replicated cache rebuilds with one tiled all_gather.
# Per-round communication is O(cap * d) bytes (the gathered row blocks),
# independent of n — it rides ICI while each device streams only its
# 1/ndev of the matrix: aggregate HBM bandwidth AND aggregate capacity.
# ---------------------------------------------------------------------------

_MESH_RNN_SEGMENTS: dict = {}


def _mesh_rnn_segment(mesh, r_cap: int, p_cap: int, blk: int,
                      seg_rounds: int):
    key = (mesh, r_cap, p_cap, blk, seg_rounds)
    if key in _MESH_RNN_SEGMENTS:
        return _MESH_RNN_SEGMENTS[key]

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    ndev = mesh.shape["data"]
    f32 = jnp.float32
    i32 = jnp.int32
    HI = jax.lax.Precision.HIGHEST

    def seg(carry, max_size):
        (cents_l, sizes0, births0, active0, blocked0, log0, heights0,
         step0, counter0, pending0, nn0, nnd0) = carry
        rows_per, d = cents_l.shape
        n_pad = rows_per * ndev
        my = jax.lax.axis_index("data").astype(i32)
        row0 = my * rows_per
        gids = row0 + jnp.arange(rows_per, dtype=i32)
        n_blocks_l = rows_per // blk

        def gather_rows(cents_l, idxs):
            """cents[idxs] (replicated), exact: psum of owner rows."""
            li = idxs - row0
            inb = (li >= 0) & (li < rows_per)
            safe = jnp.clip(li, 0, rows_per - 1)
            contrib = jnp.where(inb[:, None], cents_l[safe], 0.0)
            return jax.lax.psum(contrib, "data")

        def nn_rows(cents_l, sizes, unblocked, r_idx, r_valid, nn, nnd):
            """Mesh counterpart of :func:`_nn_rows`: local column scan +
            cross-device (distance, index) combine."""
            rows = gather_rows(cents_l, jnp.clip(r_idx, 0, n_pad - 1))
            rsz = jnp.take(sizes, r_idx)
            rnorm = jnp.sum(rows * rows, axis=1)
            rs_f = rsz.astype(f32)

            def blk_fn(carry, ci):
                bd, bn = carry
                c0 = ci * blk
                cblock = jax.lax.dynamic_slice_in_dim(cents_l, c0, blk, 0)
                g0 = row0 + c0
                csz = jax.lax.dynamic_slice_in_dim(sizes, g0, blk, 0)
                cunb = jax.lax.dynamic_slice_in_dim(unblocked, g0, blk, 0)
                cnorm = jnp.sum(cblock * cblock, axis=1)
                g = jax.lax.dot_general(
                    rows, cblock,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    precision=HI, preferred_element_type=f32)
                d2 = jnp.maximum(
                    rnorm[:, None] + cnorm[None, :] - 2.0 * g, 0.0)
                cs_f = csz.astype(f32)
                w = (rs_f[:, None] * cs_f[None, :]
                     / (rs_f[:, None] + cs_f[None, :])) * d2
                gidx = g0 + jnp.arange(blk, dtype=i32)
                feas = (cunb[None, :] & r_valid[:, None]
                        & (r_idx[:, None] != gidx[None, :])
                        & ((rsz[:, None] + csz[None, :]) <= max_size))
                E = jnp.where(feas, w, jnp.inf)
                cbd = jnp.min(E, axis=1)
                cbn = gidx[jnp.argmin(E, axis=1)]
                better = (cbd < bd) | ((cbd == bd) & (cbn < bn))
                return (jnp.where(better, cbd, bd),
                        jnp.where(better, cbn, bn)), None

            carry0 = (jnp.full(r_cap, jnp.inf, f32),
                      jnp.full(r_cap, _BIG_I32, i32))
            (bd, bn), _ = jax.lax.scan(
                blk_fn, carry0, jnp.arange(n_blocks_l, dtype=i32))
            # device order == ascending global column order: global min,
            # ties to the smallest index among devices achieving it
            allbd = jax.lax.all_gather(bd, "data")  # (ndev, r_cap)
            allbn = jax.lax.all_gather(bn, "data")
            gbd = jnp.min(allbd, axis=0)
            gbn = jnp.min(
                jnp.where(allbd == gbd[None, :], allbn, _BIG_I32), axis=0)
            tgt = jnp.where(r_valid, r_idx, n_pad)
            nn = nn.at[tgt].set(gbn, mode="drop")
            nnd = nnd.at[tgt].set(gbd, mode="drop")
            return nn, nnd

        def nn_update(cents_l, sizes, unblocked, new_idx, new_valid, nn,
                      nnd):
            """Mesh counterpart of :func:`_nn_update`: minimize LOCAL rows
            against the new clusters, then rebuild the replicated cache
            with a tiled all_gather."""
            newc = gather_rows(cents_l, jnp.clip(new_idx, 0, n_pad - 1))
            newsz = jnp.take(sizes, new_idx)
            nnorm = jnp.sum(newc * newc, axis=1)
            ns_f = newsz.astype(f32)
            nn_l0 = jax.lax.dynamic_slice_in_dim(nn, row0, rows_per, 0)
            nnd_l0 = jax.lax.dynamic_slice_in_dim(nnd, row0, rows_per, 0)

            def blk_fn(carry, bi):
                nn_l, nnd_l = carry
                r0 = bi * blk
                rows = jax.lax.dynamic_slice_in_dim(cents_l, r0, blk, 0)
                g0 = row0 + r0
                rsz = jax.lax.dynamic_slice_in_dim(sizes, g0, blk, 0)
                runb = jax.lax.dynamic_slice_in_dim(unblocked, g0, blk, 0)
                rnn = jax.lax.dynamic_slice_in_dim(nn_l, r0, blk, 0)
                rnnd = jax.lax.dynamic_slice_in_dim(nnd_l, r0, blk, 0)
                rnorm = jnp.sum(rows * rows, axis=1)
                g = jax.lax.dot_general(
                    rows, newc,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    precision=HI, preferred_element_type=f32)
                d2 = jnp.maximum(
                    rnorm[:, None] + nnorm[None, :] - 2.0 * g, 0.0)
                rs_f = rsz.astype(f32)
                w = (rs_f[:, None] * ns_f[None, :]
                     / (rs_f[:, None] + ns_f[None, :])) * d2
                gidx = g0 + jnp.arange(blk, dtype=i32)
                feas = (new_valid[None, :] & runb[:, None]
                        & (gidx[:, None] != new_idx[None, :])
                        & ((rsz[:, None] + newsz[None, :]) <= max_size))
                E = jnp.where(feas, w, jnp.inf)
                bd = jnp.min(E, axis=1)
                bn = new_idx[jnp.argmin(E, axis=1)]
                better = (bd < rnnd) | ((bd == rnnd) & (bn < rnn))
                nn_l = jax.lax.dynamic_update_slice_in_dim(
                    nn_l, jnp.where(better, bn, rnn), r0, 0)
                nnd_l = jax.lax.dynamic_update_slice_in_dim(
                    nnd_l, jnp.where(better, bd, rnnd), r0, 0)
                return (nn_l, nnd_l), None

            (nn_l, nnd_l), _ = jax.lax.scan(
                blk_fn, (nn_l0, nnd_l0), jnp.arange(n_blocks_l, dtype=i32))
            nn = jax.lax.all_gather(nn_l, "data", tiled=True)
            nnd = jax.lax.all_gather(nnd_l, "data", tiled=True)
            return nn, nnd

        def round_fn(st):
            (cents_l, sizes, births, active, blocked, log, heights, step,
             counter, pending, nn, nnd, done, it) = st
            unb = active & ~blocked
            r_count = jnp.sum(pending.astype(i32))

            def recompute_branch(args):
                (cents_l, sizes, births, active, blocked, log, heights,
                 step, counter, pending, nn, nnd) = args
                r_idx, r_val, processed = _compact_mask(pending, r_cap)
                nn, nnd = nn_rows(cents_l, sizes, unb, r_idx, r_val, nn,
                                  nnd)
                return (cents_l, sizes, births, active, blocked, log,
                        heights, step, counter, pending & ~processed, nn,
                        nnd, jnp.int32(1))

            def merge_branch(args):
                (cents_l, sizes, births, active, blocked, log, heights,
                 step, counter, pending, nn, nnd) = args
                ar = jnp.arange(n_pad, dtype=i32)
                finite = jnp.isfinite(nnd) & unb
                blocked = blocked | (unb & ~finite)
                mutual = finite & (jnp.take(nn, nn) == ar) & (ar < nn)
                any_mutual = jnp.any(mutual)
                any_finite = jnp.any(finite)
                i_star = jnp.argmin(
                    jnp.where(finite, nnd, jnp.inf)).astype(i32)
                mutual = jnp.where(~any_mutual & any_finite, ar == i_star,
                                   mutual)
                p_idx, p_val, _ = _compact_mask(mutual, p_cap)
                ca = gather_rows(cents_l, jnp.clip(p_idx, 0, n_pad - 1))
                cb = gather_rows(cents_l, jnp.clip(
                    jnp.take(nn, p_idx), 0, n_pad - 1))
                (c_new, keep_t, sizes, births, active, log, heights, step,
                 counter, unb2, recompute, is_keep, p) = _apply_pairs_core(
                    sizes, births, active, blocked, log, heights, step,
                    counter, nn, p_idx, p_val, ca, cb)
                # owner-local scatter of the merged centroid rows
                lk = keep_t - row0
                owned = (lk >= 0) & (lk < rows_per)
                tgt_l = jnp.where(owned, lk, rows_per)
                cents_l = cents_l.at[tgt_l].set(c_new, mode="drop")
                q_idx, q_val, _ = _compact_mask(is_keep, p_cap)
                nn, nnd = nn_update(cents_l, sizes, unb2, q_idx, q_val,
                                    nn, nnd)
                return (cents_l, sizes, births, active, blocked, log,
                        heights, step, counter, recompute, nn, nnd, p)

            args = (cents_l, sizes, births, active, blocked, log, heights,
                    step, counter, pending, nn, nnd)
            out = jax.lax.cond(r_count > 0, recompute_branch, merge_branch,
                               args)
            (cents_l, sizes, births, active, blocked, log, heights, step,
             counter, pending, nn, nnd, merged) = out
            alive = jnp.sum((active & ~blocked).astype(i32))
            done = (alive < 2) | ((r_count == 0) & (merged == 0))
            return (cents_l, sizes, births, active, blocked, log, heights,
                    step, counter, pending, nn, nnd, done, it + 1)

        def cond(st):
            return ~st[12] & (st[13] < seg_rounds)

        out = jax.lax.while_loop(
            cond, round_fn,
            (cents_l, sizes0, births0, active0, blocked0, log0, heights0,
             step0, counter0, pending0, nn0, nnd0, jnp.bool_(False),
             jnp.int32(0)))
        return out[:12], out[12]

    spec = (P("data", None), *([P()] * 11))
    fn = shard_map(
        seg, mesh=mesh,
        in_specs=(spec, P()),
        out_specs=(spec, P()),
        check_vma=False,
    )
    jitted = jax.jit(fn, donate_argnums=(0,))
    _MESH_RNN_SEGMENTS[key] = jitted
    return jitted


def _mesh_rnn_loop(x: jax.Array, n_items: int, max_size: int, mesh):
    """Run the reciprocal-NN rounds with the centroid matrix row-sharded
    over the mesh's 'data' axis. ``x`` is the UNPADDED (n, d) feature
    matrix. Same return contract as :func:`_rnn_loop`; the host cut is
    shared."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    ndev = mesh.shape["data"]
    _, d = x.shape
    rows_per = -(-_pad_len(n_items) // ndev)
    # local column tiles: big for MXU efficiency when rows allow, 128
    # otherwise; rows_per rounds UP to a tile multiple (<= 2% waste at
    # the sizes where 2048 applies)
    blk = 2048 if rows_per >= 2048 else 128
    rows_per = -(-rows_per // blk) * blk
    n_pad = rows_per * ndev
    d_pad = ((d + 127) // 128) * 128
    i32 = jnp.int32
    f32 = jnp.float32
    idx0 = jnp.arange(n_pad, dtype=i32)
    active = idx0 < n_items
    state = (
        _pad_features(x, n_pad, d_pad),                    # cents
        active.astype(i32),                                # sizes
        jnp.where(active, idx0, _BIG_I32 - n_pad + idx0),  # births
        active,                                            # active
        ~active,                                           # blocked
        jnp.zeros((n_pad, 3), i32),                        # log
        jnp.zeros((n_pad,), f32),                          # heights
        jnp.int32(0),                                      # step
        jnp.int32(n_items),                                # counter
        jnp.array(active, copy=True),                      # pending
        jnp.zeros(n_pad, i32),                             # nn
        jnp.full(n_pad, jnp.inf, f32),                     # nnd
    )
    shardings = (NamedSharding(mesh, P("data", None)),
                 *([NamedSharding(mesh, P())] * 11))
    state = jax.device_put(tuple(state), shardings)
    r_cap = min(_R_CAP, n_pad)
    p_cap = min(_P_CAP, n_pad)
    max_rounds = 4 * n_items + 2 * (n_items // r_cap + 2) + 8
    flops_round = max(r_cap, p_cap) * n_pad * d_pad * 2
    seg_rounds = int(max(8, min(4096, 10.0 / (flops_round / 5e13 + 1e-3))))
    segment = _mesh_rnn_segment(mesh, r_cap, p_cap, blk, seg_rounds)
    ms = jnp.int32(max_size)
    max_segments = max_rounds // seg_rounds + 2
    for _ in range(max_segments):
        state, done = segment(tuple(state), ms)
        if bool(np.asarray(done)):  # one scalar pull per segment
            break
    else:  # pragma: no cover — every round merges >= 1 or blocks the rest
        raise RuntimeError(
            f"mesh reciprocal-NN rounds did not converge (n={n_items})")
    return state[5], state[6], state[7]


_MESH_CHAIN_SEGMENTS: dict = {}


def _mesh_chain_segment(mesh):
    """shard_map chain segment: the centroid matrix row-shards over the
    mesh's 'data' axis so each step's (n, d) streamed pass divides across
    devices — the chain engine's HBM-bandwidth bound becomes aggregate
    bandwidth, and (n, d) can exceed one chip's HBM.

    Per-step communication is tiny and constant: two (d,) ``psum``s (fetch
    the chain head's and its predecessor's centroid rows from their owners)
    and three scalar ``pmin``s (global min distance, first global index
    achieving it, the predecessor's distance). All small state (sizes,
    births, chain, log) is replicated and updated identically on every
    device. Trajectories are BIT-IDENTICAL to the single-device segment:
    per-row arithmetic is unchanged, min/psum-of-one-owner-row are exact,
    and the argmin tie-break (first global index) is reproduced explicitly.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    if mesh in _MESH_CHAIN_SEGMENTS:
        return _MESH_CHAIN_SEGMENTS[mesh]

    ndev = mesh.shape["data"]
    f32 = jnp.float32
    i32 = jnp.int32

    def seg(carry, max_size, seg_iters):
        cents_l = carry[0]  # (n_pad/ndev, d) local row block
        rows_per = cents_l.shape[0]
        n_pad = rows_per * ndev
        my = jax.lax.axis_index("data")
        row0 = (my * rows_per).astype(i32)
        gids = row0 + jnp.arange(rows_per, dtype=i32)

        def fetch_row(cents_l, i):
            """cents[i] from its owner, exact: psum of one row + zeros."""
            li = i - row0
            inb = (li >= 0) & (li < rows_per)
            safe = jnp.clip(li, 0, rows_per - 1)
            row = jnp.where(inb, cents_l[safe], jnp.zeros_like(cents_l[0]))
            return jax.lax.psum(row, "data")

        def body(carry):
            (cents_l, sizes, births, active, blocked, chain, clen, log,
             heights, step, counter, n_unb, it) = carry

            need_seed = clen == 0
            first = jnp.argmax(active & ~blocked).astype(i32)
            chain = jnp.where(need_seed, chain.at[0].set(first), chain)
            clen = jnp.where(need_seed, i32(1), clen)

            top = chain[clen - 1]
            prev = chain[jnp.maximum(clen - 2, 0)]
            has_prev = clen >= 2

            c_top = fetch_row(cents_l, top)
            s_top = sizes[top]
            s_top_f = s_top.astype(f32)
            diff = cents_l - c_top[None, :]
            d2_l = jnp.sum(diff * diff, axis=1)
            sizes_g = sizes[gids]
            s_j = sizes_g.astype(f32)
            w_l = (s_top_f * s_j / (s_top_f + s_j)) * d2_l
            feas = (active[gids] & (gids != top)
                    & ((s_top + sizes_g) <= max_size))
            E_l = jnp.where(feas, w_l, jnp.inf)
            dmin = jax.lax.pmin(jnp.min(E_l), "data")
            found = jnp.isfinite(dmin)
            # first global index achieving the min (== jnp.argmin semantics)
            nn_any = jax.lax.pmin(
                jnp.min(jnp.where(E_l == dmin, gids, _BIG_I32)), "data")
            # E[prev] from its owner (non-owners contribute +inf)
            lp = prev - row0
            inb = (lp >= 0) & (lp < rows_per)
            e_prev = jax.lax.pmin(jnp.where(
                inb, E_l[jnp.clip(lp, 0, rows_per - 1)], jnp.inf), "data")
            prev_is_min = has_prev & found & (e_prev <= dmin)
            nn = jnp.where(prev_is_min, prev, nn_any.astype(i32))

            do_merge = prev_is_min
            do_block = ~found
            do_extend = found & ~prev_is_min

            keep = jnp.minimum(top, prev)
            drop = jnp.maximum(top, prev)
            s_a = sizes[top]
            s_b = sizes[prev]
            s_new = s_a + s_b
            c_prev = fetch_row(cents_l, prev)
            c_new = (s_a.astype(f32) * c_top
                     + s_b.astype(f32) * c_prev) / s_new.astype(f32)
            bhi = jnp.maximum(births[top], births[prev])
            blo = jnp.minimum(births[top], births[prev])

            # owner-local write of the merged centroid row
            lk = keep - row0
            owned = (lk >= 0) & (lk < rows_per)
            safe = jnp.clip(lk, 0, rows_per - 1)
            new_row = jnp.where(owned & do_merge, c_new, cents_l[safe])
            cents_l = cents_l.at[safe].set(new_row)

            sizes = jnp.where(
                do_merge, sizes.at[keep].set(s_new).at[drop].set(0), sizes)
            births = jnp.where(do_merge, births.at[keep].set(counter), births)
            active = jnp.where(do_merge, active.at[drop].set(False), active)
            log = jnp.where(
                do_merge, log.at[step].set(jnp.stack([bhi, blo, counter])),
                log)
            heights = jnp.where(do_merge, heights.at[step].set(dmin), heights)
            blocked = jnp.where(do_block, blocked.at[top].set(True), blocked)
            chain = jnp.where(do_extend, chain.at[clen].set(nn), chain)
            clen = jnp.where(do_merge, clen - 2,
                             jnp.where(do_block, clen - 1, clen + 1))
            counter = jnp.where(do_merge, counter + 1, counter)
            step = jnp.where(do_merge, step + 1, step)
            n_unb = n_unb - jnp.where(do_merge | do_block, 1, 0).astype(i32)

            return (cents_l, sizes, births, active, blocked, chain, clen,
                    log, heights, step, counter, n_unb, it + 1)

        def cond(carry):
            return (carry[11] >= 2) & (carry[12] < seg_iters)

        return jax.lax.while_loop(cond, body, (*carry[:12], jnp.int32(0)))

    spec = (P("data", None), *([P()] * 12))
    fn = shard_map(
        seg, mesh=mesh,
        in_specs=(spec, P(), P()),
        out_specs=spec,
        check_vma=False,
    )
    jitted = jax.jit(fn, donate_argnums=(0,))
    _MESH_CHAIN_SEGMENTS[mesh] = jitted
    return jitted


def _segment_iters(n_pad: int, d: int) -> int:
    """Iterations per device program, sized to ~10-15 s of device time: each
    iteration streams the (n_pad, d) centroid matrix once (plus constant
    per-iteration overhead), so scale inversely with the matrix size."""
    bytes_per_iter = n_pad * d * 4 * 1.3 + 4 * n_pad * 4
    t_iter = bytes_per_iter / 6e11 + 8e-6  # ~600 GB/s effective + overhead
    return int(max(2048, min(1 << 17, 12.0 / t_iter)))


def _chain_loop(x_pad: jax.Array, n_items: int, max_size: int, mesh=None):
    """Run the NN-chain to exhaustion in bounded-length device segments.

    With ``mesh``, the centroid matrix row-shards over the 'data' axis
    (:func:`_mesh_chain_segment`) — bit-identical trajectory, aggregate
    bandwidth and HBM. Returns (log (n_pad, 3) i32 [birth_hi, birth_lo,
    new_birth], heights (n_pad,) f32, step count).
    """
    n_pad, d = x_pad.shape
    carry = _chain_start(x_pad, jnp.int32(n_items))
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        ndev = mesh.shape["data"]
        shardings = (NamedSharding(mesh, P("data", None)),
                     *([NamedSharding(mesh, P())] * 12))
        carry = jax.device_put(tuple(carry), shardings)
        segment = _mesh_chain_segment(mesh)
        seg = _segment_iters(n_pad // ndev, d)
    else:
        segment = _chain_segment
        seg = _segment_iters(n_pad, d)
    # Each iteration performs exactly one of {merge, block, extend}; pushes
    # are bounded by pops + n, so <= ~8n iterations total — the segment cap
    # is a backstop against a logic bug turning into a hang.
    max_segments = (8 * n_pad + 16) // seg + 2
    ms = jnp.int32(max_size)
    si = jnp.int32(seg)
    for _ in range(max_segments):
        carry = segment(carry, ms, si)
        if int(carry[11]) < 2:  # n_unblocked — one scalar sync per segment
            break
    else:
        # never reached when the loop logic is correct; a partial log would
        # silently yield a wrong (over-fragmented) partition, so fail loud
        raise RuntimeError(
            f"NN-chain did not converge within {max_segments * seg} "
            f"iterations (n={n_items}) — loop invariant violated"
        )
    return carry[7], carry[8], carry[9]


def _cut(
    log: np.ndarray,       # (m, 3) [hi, lo, new] birth stamps, chain order
    heights: np.ndarray,   # (m,)
    n_items: int,
    n_target: int,
) -> tuple[list[list[int]], np.ndarray]:
    """Apply the n_items - n_target smallest-height merges (all if fewer) —
    the partition the greedy loop stops at. Returns (clusters, applied log
    row indices in ascending-height order).

    Heights are first MONOTONE-CORRECTED along dendrogram paths
    (h'[parent] = max(h[parent], h'[children])): in exact arithmetic Ward
    has no inversions so this is the identity, but float32 rounding can
    order a parent's recomputed-from-centroids height a few ulps below a
    child's — an uncorrected sort could then cut a parent without its
    child, duplicating its leaves across two output clusters. The stable
    (corrected height, chain order) sort is child-before-parent by
    construction (children precede parents in the chain log)."""
    m = log.shape[0]
    take = min(m, n_items - n_target)
    h = heights.astype(np.float64).copy()
    hmap = {int(new): j for j, (_, _, new) in enumerate(log)}
    for j in range(m):  # children precede parents in chain order
        for child in (int(log[j, 0]), int(log[j, 1])):
            cj = hmap.get(child)
            if cj is not None and h[cj] > h[j]:
                h[j] = h[cj]
    order = np.lexsort((np.arange(m), h))
    children: dict[int, tuple[int, int]] = {}
    roots = set(range(n_items))
    for j in order[:take]:
        hi, lo, new = (int(v) for v in log[j])
        children[new] = (hi, lo)
        roots.discard(hi)
        roots.discard(lo)
        roots.add(new)
    clusters = [_leaf_indices(b, n_items, children) for b in sorted(roots)]
    return clusters, order[:take]


def constrained_ward_chain(
    embeddings,
    ids: Sequence[str] | None = None,
    *,
    min_size: int = 3,
    max_size: int = 6,
    reassign_dropped: bool = True,
    mesh=None,
) -> ClusterResult:
    """Size-constrained Ward via nearest-neighbor chains: the greedy
    engine's partition (wherever merge distances are distinct) without its
    O(n^2) matrix — exact-semantics clustering at n where only the bucketed
    approximation used to fit.

    ``embeddings`` may be numpy or a device-resident jax array (features
    straight from the embedder never leave HBM). Always the "centroid"
    update rule: distances are recomputed from merged centroids exactly as
    the reference does (clustering.go:83-87). ``reassign_dropped`` defaults
    True like the other scale mode: under-min clusters spill their members
    into the nearest clusters with room (device-side candidate search)
    instead of silently dropping them (clustering.go:268-271).

    Precision scope of the equivalence claim: "same partition as the greedy
    engine" is a statement about EXACT arithmetic (like CLAUDE.md's
    bit-parity caveat). Both engines run float32; distances that are
    mathematically distinct but within a few ulps of each other can round
    into a different order on the two computation paths (the greedy engine
    forms singleton distances via a Gram matmul, this engine via direct
    diff-square-sum) and diverge the merge sequence. The cut is structurally
    robust to such rounding (monotone-corrected heights, see :func:`_cut`);
    the resulting partitions differ only where distances effectively tie.
    """
    if isinstance(embeddings, jax.Array):
        feats = embeddings.astype(jnp.float32)
        if mesh is None and len(feats.sharding.device_set) > 1:
            # no mesh requested: consolidate mesh-sharded features instead
            # of letting GSPMD partition the while_loop into per-iteration
            # collectives (the sharded path is the explicit shard_map
            # program, taken only with mesh=)
            feats = jax.device_put(feats, next(iter(feats.devices())))
    else:
        feats = jnp.asarray(np.asarray(embeddings, dtype=np.float32))
    if feats.ndim != 2:
        raise ValueError(f"embeddings must be (n, d), got {feats.shape}")
    n, d = feats.shape
    if ids is None:
        from imageclust_tpu.cluster.ward import DefaultIds

        ids = DefaultIds(n)  # lazy workflow.go:140 id scheme
    if len(ids) != n:
        raise ValueError("ids length must match embeddings")

    n_target = calculate_optimal_clusters(n, min_size, max_size)

    import os

    if os.environ.get("IMAGECLUST_CHAIN_IMPL", "rnn") != "seq":
        # default: batched reciprocal-NN rounds — same dendrogram on the
        # tie-free domain, ~tens of device passes instead of ~3n; with a
        # mesh the centroid matrix row-shards over 'data'. The loops pad
        # internally (one fused op — see _pad_features).
        if mesh is not None:
            log, heights, steps = _mesh_rnn_loop(feats, n, max_size, mesh)
        else:
            log, heights, steps = _rnn_loop(feats, n, max_size)
    else:
        # sequential NN-chain (the mesh= variant is the bit-identical
        # psum/pmin formulation)
        n_pad = _pad_len(n)
        if mesh is not None:
            ndev = mesh.shape["data"]
            block = 128 * ndev
            n_pad = ((n_pad + block - 1) // block) * block
        if n_pad != n:
            feats_p = jnp.concatenate(
                [feats, jnp.zeros((n_pad - n, d), feats.dtype)])
        else:
            feats_p = feats
        log, heights, steps = _chain_loop(feats_p, n, max_size, mesh=mesh)
    m = int(steps)
    log = np.asarray(log)[:m]
    heights = np.asarray(heights)[:m]

    clusters, applied = _cut(log, heights, n, n_target)

    kept: list[list[int]] = []
    dropped_idx: list[int] = []
    for members in clusters:
        if len(members) < min_size:  # clustering.go:268-271
            dropped_idx.extend(members)
            continue
        kept.append(members)

    from imageclust_tpu.cluster.sharded import _Clusters, _spill_global

    cols = _Clusters.from_lists(kept)
    if reassign_dropped and dropped_idx:
        dropped_idx = _spill_global(feats, cols, dropped_idx, max_size)

    members_f, offsets_f = cols.finalize()
    # result.merges: the applied merges, in greedy (ascending-height) order
    return ClusterResult(
        merges=log[applied],
        n_items=n,
        n_clusters_target=n_target,
        members=members_f,
        offsets=offsets_f,
        ids=ids,
        dropped_idx=dropped_idx,
    )
