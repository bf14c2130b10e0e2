"""Scalable constrained-Ward: k-means bucketing + vmapped per-bucket merges.

The reference engine is O(n^2) memory / O(n^3) time in one Go thread
(clustering.go:61-73, :119-133, :220-246) — unusable beyond a few thousand
images. At 100k+ images a single dense distance matrix no longer fits in HBM
either, so the scalable path decomposes the problem the TPU way:

1. **Bucketing** — a few Lloyd iterations of k-means over the embeddings
   (distances via MXU matmuls), followed by a host-side capacity repair so
   every bucket holds between ``min_size`` and ``bucket_size`` items. Only
   tiny per-item summaries (assigned bucket, own distance, top-K preferred
   buckets) ever leave the device.
2. **Per-bucket exact Ward** — the same masked-argmin merge loop as
   :mod:`imageclust_tpu.cluster.ward`, run as a ``vmap`` over buckets inside
   one jit; bucket contents are gathered on device from the (resident)
   feature matrix, and with a device mesh the bucket axis is sharded over
   ``data`` so buckets run on all chips with zero collectives.

Inside a bucket the semantics are exactly the reference's (same tie-breaks,
same maxSize masking, same under-min drop). Across buckets the decomposition
approximates the global greedy merge order — the price of scaling;
``n <= exact_limit`` jobs use the exact engine instead
(config.ClusterConfig.exact_limit).
"""

from __future__ import annotations

import logging
import math
import os
import time
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from imageclust_tpu.cluster.ward import (
    ClusterResult,
    _BIG_I32,
    _leaf_indices,
    _merge_body,
    _LoopState,
    calculate_optimal_clusters,
    pairwise_ward_singleton,
)

__all__ = ["constrained_ward_bucketed", "kmeans"]

log = logging.getLogger(__name__)


class _PhaseTimer:
    """Opt-in per-phase wall timing (IMAGECLUST_CLUSTER_PROFILE=1): each
    tick optionally SYNCS a device array first so the phase boundary is
    real — syncs cost pipelining, so the timer is a no-op unless asked."""

    def __init__(self):
        self.on = bool(os.environ.get("IMAGECLUST_CLUSTER_PROFILE"))
        self.t = time.perf_counter()

    def tick(self, label: str, sync=None) -> None:
        if not self.on:
            return
        if sync is not None:
            np.asarray(sync)  # block_until_ready is unreliable on axon
        now = time.perf_counter()
        log.info("cluster phase %-16s %7.2fs", label, now - self.t)
        self.t = now

class _StepTimer(_PhaseTimer):
    """Finer-grained opt-in timer for sub-steps INSIDE a phase
    (IMAGECLUST_REPAIR_PROFILE=1) — same tick contract as
    :class:`_PhaseTimer`, different env gate and log prefix."""

    def __init__(self, prefix: str):
        self.on = bool(os.environ.get("IMAGECLUST_REPAIR_PROFILE"))
        self.prefix = prefix
        self.t = time.perf_counter()

    def tick(self, label: str, sync=None) -> None:
        if not self.on:
            return
        if sync is not None:
            np.asarray(sync)
        now = time.perf_counter()
        log.info("%s step %-18s %7.2fs", self.prefix, label, now - self.t)
        self.t = now


_TOP_PREF = 8  # per-item bucket preferences exported to the host

# flip to need-only preference computation above this n * n_buckets product
# (~the point where the full-n top_k's extra HBM passes over the n*k*4-byte
# distance stream outweigh the need-set's padded re-scan — see the
# constrained_ward_bucketed call site for the measurements)
_PREF_NEED_ONLY_MIN_WORK = 1 << 36


_KMEANS_BLOCK = 1 << 16  # rows per assignment block: caps the (block, k)
# distance tile so million-image jobs never materialize an (n, k) matrix


def _kmeans_block(n_real: int, k: int, block: int) -> int:
    block = min(block, 1 << (max(n_real - 1, 1)).bit_length())
    # cap the (block, k) distance tile at ~1.5 GB: at 10M rows k is ~52k
    # buckets and the default 64k block would need a 13.7 GB tile
    while block > 2048 and block * k * 4 > (3 << 29):
        block //= 2
    return block


def _kmeans_tail(x: jax.Array, block: int):
    """Zero-padded tail block (< block rows) + its validity mask — the only
    padded copy of any feature rows."""
    n_real, d = x.shape
    n_main = (n_real // block) * block
    tail_n = n_real - n_main
    tail = jnp.zeros((block, d), x.dtype)
    if tail_n:
        tail = jax.lax.dynamic_update_slice_in_dim(
            tail, jax.lax.dynamic_slice_in_dim(x, n_main, tail_n, 0), 0, 0)
    return tail, jnp.arange(block) < tail_n


def _sqdist_tile(rows: jax.Array, cents: jax.Array,
                 cent_norms: jax.Array | None = None) -> jax.Array:
    """(block, k) squared distances for bucket ASSIGNMENT.

    ``cent_norms`` (optional precomputed (k,) f32 squared norms of the
    STORED centroid values) skips the per-tile norm reduction over the full
    (k, d) matrix — bit-identical when ``cents`` is already in its compute
    dtype (the spill path: int8/bf16/f32 residency all store centroids
    pre-rounded), which every caller passing it guarantees.

    For bf16-resident features the gram runs with native bf16 MXU inputs
    (centroids rounded to bf16; norms taken from the same rounded values so
    the quadratic expansion stays consistent) — ~4x over upcasting to f32
    matmuls, in the mode already documented as non-parity near ties.

    int8 rows run a TRUE int8 x int8 -> int32 MXU gram (~2x the bf16 rate):
    centroids round onto the feature grid first (<= 0.5/dim, the mode's
    documented tolerance — the spill path's centroids already live there),
    after which every product is EXACT integer arithmetic; the int32 gram
    converts to f32 losslessly for |g| < 2^24 (d <= ~1000 at worst-case
    coordinates) and within f32 rounding above. f32 features keep the
    exact f32 path."""
    if rows.dtype == jnp.int8:
        c8 = cents if cents.dtype == jnp.int8 else jnp.clip(
            jnp.round(cents.astype(jnp.float32)), -127, 127).astype(jnp.int8)
        g = jax.lax.dot_general(
            rows, c8, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        xx = jnp.sum(jnp.square(rows.astype(jnp.float32)), axis=1)[:, None]
        yy = (cent_norms if cent_norms is not None else
              jnp.sum(jnp.square(c8.astype(jnp.float32)), axis=1))[None, :]
        return jnp.maximum(xx + yy - 2.0 * g, 0.0)
    if rows.dtype == jnp.bfloat16:
        c16 = cents.astype(jnp.bfloat16)
        xx = jnp.sum(jnp.square(rows.astype(jnp.float32)), axis=1)[:, None]
        yy = (cent_norms if cent_norms is not None else
              jnp.sum(jnp.square(c16.astype(jnp.float32)), axis=1))[None, :]
        g = jax.lax.dot_general(
            rows, c16, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.maximum(xx + yy - 2.0 * g, 0.0)
    if cent_norms is not None:
        # mirror _sqdist exactly (same reduction, same dot_general) with
        # only the yy pass hoisted — bit-identical distances
        x = rows.astype(jnp.float32)
        xx = jnp.sum(x * x, axis=1)[:, None]
        g = jax.lax.dot_general(
            x, cents.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.maximum(xx + cent_norms[None, :] - 2.0 * g, 0.0)
    return _sqdist(rows, cents)


@jax.jit
def _feat_int8(x: jax.Array) -> jax.Array:
    """One-time symmetric per-tensor int8 quantization of the feature
    matrix (scale = absmax/127). The scale itself is DISCARDED: Ward merge
    order is invariant to a global feature scale, so the engine clusters
    the raw grid values. Fuses to two streamed passes (abs-max reduction,
    then round/clip/cast) — no f32 copy materializes."""
    s = jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0
    q = jnp.round(x.astype(jnp.float32) / jnp.maximum(s, 1e-30))
    return jnp.clip(q, -127, 127).astype(jnp.int8)


@partial(jax.jit, static_argnames=("k",))
def _kmeans_init(x: jax.Array, k: int, seed) -> jax.Array:
    key = jax.random.PRNGKey(seed)
    init_idx = jax.random.permutation(key, x.shape[0])[:k]
    return x[init_idx].astype(jnp.float32)  # (k, d): f32 even on bf16 feats


@partial(jax.jit, static_argnames=("k", "block"), donate_argnums=(1,))
def _kmeans_iter(x: jax.Array, cents: jax.Array, k: int,
                 block: int) -> jax.Array:
    n_real, d = x.shape
    n_blocks = (n_real // block)
    tail, tail_valid = _kmeans_tail(x, block)
    int8 = x.dtype == jnp.int8
    acc_dt = jnp.float32 if x.dtype == jnp.float32 else jnp.bfloat16

    def accum(carry, rows, valid):
        sums, counts = carry
        d2 = _sqdist_tile(rows, cents)  # (block, k)
        assign = jnp.argmin(d2, axis=1)
        # 0/1 one-hot is exact in bf16; bf16 x bf16 MXU products are exact
        # in the f32 accumulator, so acc_dt only changes speed, not values.
        # int8 rows: int8 onehot x int8 rows -> int32 segment sums on the
        # MXU at ~2x the bf16 rate, EXACT (per-center block sums are
        # <= 65536 * 127, well inside int32)
        if int8:
            onehot = jax.nn.one_hot(assign, k, dtype=jnp.int8)
            onehot = onehot * valid[:, None].astype(jnp.int8)
            counts = counts + jnp.sum(onehot, axis=0, dtype=jnp.float32)
            sums = sums + jax.lax.dot_general(
                onehot, rows,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            return sums, counts
        onehot = jax.nn.one_hot(assign, k, dtype=acc_dt)
        onehot = onehot * valid[:, None].astype(acc_dt)
        counts = counts + jnp.sum(onehot, axis=0, dtype=jnp.float32)
        sums = sums + jax.lax.dot_general(
            onehot, rows.astype(acc_dt),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return sums, counts

    def blk(carry, i):
        rows = jax.lax.dynamic_slice_in_dim(x, i * block, block, 0)
        return accum(carry, rows, jnp.ones(block, jnp.bool_)), None

    carry = (jnp.zeros((k, d), jnp.float32), jnp.zeros(k, jnp.float32))
    if n_blocks:  # static: scan traces its body even at length 0
        carry, _ = jax.lax.scan(
            blk, carry, jnp.arange(n_blocks, dtype=jnp.int32))
    sums, counts = accum(carry, tail, tail_valid)
    new = sums / jnp.maximum(counts, 1.0)[:, None]
    return jnp.where(counts[:, None] > 0, new, cents)


@partial(jax.jit, static_argnames=("kk", "block"))
def _kmeans_summarize(x: jax.Array, cents: jax.Array, kk: int, block: int):
    """Full-data pass: per-item assignment + own-centroid distance, and —
    when ``kk > 0`` — the (n, kk) bucket-preference matrix.

    ``kk=0`` is the need-only mode: ``top_k`` over a (block, k) tile costs
    ~kk extra HBM passes over the n*k*4-byte distance stream (at the 10M
    tier that stream is ~2 TB — the dominant kmeans-phase cost), yet
    capacity repair only ever READS preference rows for items spilled from
    over-capacity buckets or dissolving under-min buckets. At the 10M
    tier's measured Lloyd distribution that need set is large (74% of
    rows — the subsampled fit leaves very skewed bucket sizes), so the
    need pass costs about what the full top_k did; the mode still wins
    because the re-scan runs OVERLAPPED with the repair phase's host
    work (see :func:`_repair_buckets_device`) instead of serially inside
    this pass. Preferences are computed later, for exactly the need-set,
    by :func:`_pref_need_rows`."""
    n_real, _ = x.shape
    n_blocks = (n_real // block)
    tail, _ = _kmeans_tail(x, block)

    def summarize(rows):
        d2 = _sqdist_tile(rows, cents)
        assign = jnp.argmin(d2, axis=1)
        own = jnp.take_along_axis(d2, assign[:, None], axis=1)[:, 0]
        if kk == 0:
            return assign, own
        _, pref = jax.lax.top_k(-d2, kk)
        return assign, own, pref

    def final_blk(_, i):
        rows = jax.lax.dynamic_slice_in_dim(x, i * block, block, 0)
        s = summarize(rows)
        if kk:
            # flatten prefs per-step (see _pref_need_rows: minor-axis
            # tile padding would inflate the stacked buffer 128/kk-fold)
            return None, (s[0], s[1], s[2].reshape(block * kk))
        return None, s

    t = summarize(tail)
    if n_blocks:
        _, parts = jax.lax.scan(
            final_blk, None, jnp.arange(n_blocks, dtype=jnp.int32))
        assign = jnp.concatenate([parts[0].reshape(-1), t[0]])[:n_real]
        own_d = jnp.concatenate([parts[1].reshape(-1), t[1]])[:n_real]
        if kk == 0:
            return assign, own_d, None
        top_pref = jnp.concatenate(
            [parts[2].reshape(-1, kk), t[2]])[:n_real]
    else:
        assign = t[0][:n_real]
        own_d = t[1][:n_real]
        if kk == 0:
            return assign, own_d, None
        top_pref = t[2][:n_real]
    return assign, own_d, top_pref


@partial(jax.jit, static_argnames=("kk", "block", "as_u16"))
def _pref_need_rows(x: jax.Array, cents: jax.Array, idx: jax.Array,
                    kk: int, block: int, as_u16: bool):
    """(m_pad, kk) bucket preferences for the gathered item set ``idx``
    (padded to a multiple of ``block``): same centroids, same
    :func:`_sqdist_tile` dtype path, same (block, k) tile shape as
    :func:`_kmeans_summarize` uses for the same k (both derive ``block``
    from :func:`_kmeans_block`'s k-cap). Values match the full-matrix
    ``top_k`` pass up to compilation-level f32 rounding (the gathered rows
    feed the matmul through a gather instead of a dynamic_slice, which can
    fuse differently); near-exact ties may therefore order differently —
    acceptable in the bucketed mode's documented approximation, and exact
    on the f32 CPU path the equivalence tests pin. Scanned one tile at a
    time — HBM stays O(block*k + m_pad*kk)."""
    m_pad = idx.shape[0]

    def blk(_, i):
        take = jax.lax.dynamic_slice_in_dim(idx, i * block, block, 0)
        rows = jnp.take(x, take, axis=0)
        d2 = _sqdist_tile(rows, cents)
        _, pref = jax.lax.top_k(-d2, kk)
        # flatten per-step: stacking (nb, block, kk) would tile-pad the
        # minor kk axis to 128 lanes — 16x HBM for kk=8 (4 GB at the 10M
        # tier, where it OOMed next to the resident matrix); (nb, block*kk)
        # keeps the minor dim lane-aligned and the bytes honest
        return None, pref.reshape(block * kk)

    _, prefs = jax.lax.scan(
        blk, None, jnp.arange(m_pad // block, dtype=jnp.int32))
    prefs = prefs.reshape(-1, kk)
    return prefs.astype(jnp.uint16) if as_u16 else prefs


# fused pref-scan row-block height: 512 rows x (128 + 512) lanes of f32
# work planes plus the resident row block stays ~6 MB of VMEM
_PREF_FUSED_ROWS = 512


def _use_pref_fused(k: int) -> tuple[bool, bool]:
    """(use fused pref scan, interpret mode). Default: on-TPU whenever k is
    large enough that XLA's k-lane ``top_k`` dominates the scan (the fused
    kernel's win grows with k; below a few thousand buckets the XLA tile
    path is already cheap). IMAGECLUST_PREF_FUSED=0 opts out; =1 forces it
    (interpret mode off-TPU, for tests) — same contract as
    IMAGECLUST_FUSED_MERGE."""
    flag = os.environ.get("IMAGECLUST_PREF_FUSED", "")
    if flag == "0":
        return False, False
    if flag == "1":
        return True, jax.default_backend() != "tpu"
    return jax.default_backend() == "tpu" and k >= 4096, False


def _fused_cast_cents(x_dtype, cents, block_c: int, d: int, d_pad: int):
    """Centroids cast to the residency compute dtype + padded for the fused
    pref kernel, with +inf norms on padding rows (shared by the need-only
    re-scan and the summarize-fused pass — same stored values, same
    rounding)."""
    if x_dtype == jnp.int8:
        c = jnp.clip(jnp.round(cents.astype(jnp.float32)),
                     -127, 127).astype(jnp.int8)
    elif x_dtype == jnp.bfloat16:
        c = cents.astype(jnp.bfloat16)
    else:
        c = cents.astype(jnp.float32)
    cn = jnp.sum(jnp.square(c.astype(jnp.float32)), axis=1)
    k = cents.shape[0]
    k_pad = ((k + block_c - 1) // block_c) * block_c
    if k_pad != k or d_pad != d:
        c = jnp.pad(c, ((0, k_pad - k), (0, d_pad - d)))
        cn = jnp.pad(cn, (0, k_pad - k), constant_values=jnp.inf)
    return c, cn


def _use_summarize_fused(k: int) -> tuple[bool, bool]:
    """(fuse prefs into the summarize pass, interpret mode). Default:
    on-TPU whenever the fused pref kernel's domain applies (k >= 4096,
    same bound as :func:`_use_pref_fused`) — ONE gram pass then yields
    assignment + own distance + the (n, kk) preference matrix, and the
    repair phase never re-computes distances. IMAGECLUST_SUMMARIZE_FUSED=0
    opts out; =1 forces it (interpret mode off-TPU, for tests)."""
    flag = os.environ.get("IMAGECLUST_SUMMARIZE_FUSED", "")
    if flag == "0":
        return False, False
    if flag == "1":
        return True, jax.default_backend() != "tpu"
    return jax.default_backend() == "tpu" and k >= 4096, False


@partial(jax.jit,
         static_argnames=("kk", "block_c", "as_u16", "interpret"))
def _kmeans_summarize_fused(x: jax.Array, cents: jax.Array, kk: int,
                            block_c: int, as_u16: bool, interpret: bool):
    """Full-data summarize with the preference top-k fused INTO the
    assignment gram: one pass over the (n, k) distance stream produces the
    assignment (= nearest-1), the own-centroid distance, AND the (n, kk)
    preference matrix — where the need-only mode re-computed the same gram
    at repair time for the ~80% of rows in the need set (measured 10M
    tier), and the XLA tile path paid a k-lane ``top_k`` over the distance
    stream. Same score expression tree and tie rule (ascending index) as
    :func:`_sqdist_tile` + ``argmin``; the only rounding difference is
    MXU-accumulation order inside the gram — the documented fused-kernel
    near-tie envelope (exact on integer grids, test-pinned)."""
    from imageclust_tpu.ops.pallas_kernels import pref_topk_block

    n_real, d = x.shape
    d_pad = ((d + 127) // 128) * 128
    rows_blk = _PREF_FUSED_ROWS
    c, cn = _fused_cast_cents(x.dtype, cents, block_c, d, d_pad)
    n_blocks = n_real // rows_blk

    def one(rows):
        if d_pad != d:
            rows = jnp.pad(rows, ((0, 0), (0, d_pad - d)))
        idx, vals = pref_topk_block(rows, c, cn, kk=kk, block_c=block_c,
                                    interpret=interpret, with_dists=True)
        pref = idx.astype(jnp.uint16) if as_u16 else idx
        # prefs flatten per step (see _pref_need_rows: a stacked minor kk
        # axis tile-pads 8 -> 128 lanes, 16x the true bytes)
        return idx[:, 0], vals[:, 0], pref.reshape(rows_blk * kk)

    def blk(_, i):
        rows = jax.lax.dynamic_slice_in_dim(x, i * rows_blk, rows_blk, 0)
        return None, one(rows)

    tail, _ = _kmeans_tail(x, rows_blk)
    t_assign, t_own, t_pref = one(tail)
    if n_blocks:
        _, (a, o, p) = jax.lax.scan(
            blk, None, jnp.arange(n_blocks, dtype=jnp.int32))
        assign = jnp.concatenate([a.reshape(-1), t_assign])[:n_real]
        own = jnp.concatenate([o.reshape(-1), t_own])[:n_real]
        prefs = jnp.concatenate(
            [p.reshape(-1, kk), t_pref.reshape(-1, kk)])[:n_real]
    else:
        assign = t_assign[:n_real]
        own = t_own[:n_real]
        prefs = t_pref.reshape(-1, kk)[:n_real]
    return assign, own, prefs


@partial(jax.jit,
         static_argnames=("kk", "block_c", "as_u16", "interpret"))
def _pref_need_rows_fused(x: jax.Array, cents: jax.Array, idx: jax.Array,
                          kk: int, block_c: int, as_u16: bool,
                          interpret: bool):
    """Fused-kernel twin of :func:`_pref_need_rows`: same (m_pad, kk)
    result contract, computed by :func:`pref_topk_block` — the (block, k)
    distance tile never materializes and XLA's k-lane ``top_k`` is replaced
    by the kernel's streaming 8-best merge. Same centroid compute-dtype
    paths as :func:`_sqdist_tile` (bf16 rows x bf16 cents, int8 x int8 ->
    int32, f32 exact) and the same score expression tree — the only
    rounding difference vs the tile path is MXU-accumulation order inside
    the gram: the same documented near-tie envelope as need-only mode
    itself.

    ``idx`` length must be a multiple of the row-block size
    (min(_PREF_FUSED_ROWS, len(idx))) — the scan floor-divides, so a
    ragged tail would be silently dropped; the assert makes that loud."""
    from imageclust_tpu.ops.pallas_kernels import pref_topk_block

    m_pad = idx.shape[0]
    rows_blk = min(_PREF_FUSED_ROWS, m_pad)
    assert m_pad % rows_blk == 0, (m_pad, rows_blk)
    d = x.shape[1]
    d_pad = ((d + 127) // 128) * 128
    k = cents.shape[0]
    k_pad = ((k + block_c - 1) // block_c) * block_c
    if x.dtype == jnp.int8:
        c = jnp.clip(jnp.round(cents.astype(jnp.float32)),
                     -127, 127).astype(jnp.int8)
    elif x.dtype == jnp.bfloat16:
        c = cents.astype(jnp.bfloat16)
    else:
        c = cents.astype(jnp.float32)
    cn = jnp.sum(jnp.square(c.astype(jnp.float32)), axis=1)
    if k_pad != k or d_pad != d:
        c = jnp.pad(c, ((0, k_pad - k), (0, d_pad - d)))
        cn = jnp.pad(cn, (0, k_pad - k), constant_values=jnp.inf)

    def blk(_, i):
        take = jax.lax.dynamic_slice_in_dim(idx, i * rows_blk, rows_blk, 0)
        rows = jnp.take(x, take, axis=0)
        if d_pad != d:
            rows = jnp.pad(rows, ((0, 0), (0, d_pad - d)))
        pref = pref_topk_block(rows, c, cn, kk=kk, block_c=block_c,
                               interpret=interpret)
        # flatten per-step (see _pref_need_rows): a stacked (nb, rows, kk)
        # minor axis tile-pads kk=8 -> 128 lanes, 16x the true bytes —
        # the 4 GB HLO temp that OOMed the 10M x 1024 int8 tier
        return None, pref.reshape(rows_blk * kk)

    _, prefs = jax.lax.scan(
        blk, None, jnp.arange(m_pad // rows_blk, dtype=jnp.int32))
    prefs = prefs.reshape(-1, kk)
    return prefs.astype(jnp.uint16) if as_u16 else prefs


# Lloyd fit runs on a random subsample of >= this many rows per center
# (ONE full-data assignment pass always follows). 32/center keeps the
# centroid estimates stable for bucketing while cutting the dominant
# (block, k) tile traffic ~6x at the 10M tier, where the fit passes are
# pure HBM-bandwidth: n*k*4 bytes per iteration regardless of d.
_KMEANS_FIT_PER_CENTER = 32

# subsampling engages only above this row count: below it the full fit is
# cheap and keeping it bit-exact means sub-1M results never change
_KMEANS_SUBSAMPLE_MIN_N = 1 << 20


@partial(jax.jit, static_argnames=("m",))
def _kmeans_subsample(x: jax.Array, m: int, seed) -> jax.Array:
    key = jax.random.fold_in(jax.random.PRNGKey(seed), 1)
    idx = jax.random.choice(key, x.shape[0], (m,), replace=False)
    return x[idx]


def kmeans(x: jax.Array, k: int, iters: int = 8, seed: int = 0,
           top_k: int = _TOP_PREF, block: int = _KMEANS_BLOCK,
           fit_per_center: int = _KMEANS_FIT_PER_CENTER,
           summarize_fused: bool = False, fused_interpret: bool = False):
    """Lloyd's k-means on device, block-scanned over rows.

    Distances are MXU matmuls computed one (block, k) tile at a time under
    ``lax.scan``; blocks are read from the ORIGINAL feature buffer via
    ``dynamic_slice`` (an earlier version concatenated a zero-padded copy
    of the whole matrix — a second (n, d) allocation that OOMed the 2M-row
    tier), with only the sub-block tail materialized padded. HBM stays
    O(n*d + k*d + block*k). Returns (centroids (k,d), assign (n,), own_d
    (n,), top_pref (n,top_k)) — everything the host-side capacity repair
    needs, a few bytes per item instead of the full (n,k) matrix.

    Each Lloyd iteration is its OWN device program, host-stepped with a
    donated centroid carry: one fused program of all ``iters`` iterations
    runs past the TPU worker's ~4-minute watchdog at the 10M x 512 tier
    (observed worker kill — same failure mode the chain engine's segmented
    loops work around). Per-iteration numerics are unchanged.

    When n greatly exceeds ``fit_per_center * k``, the Lloyd iterations fit
    on a random subsample of that size (the final assignment pass always
    sees every row): this is bucket SEEDING, not the clustering result —
    capacity repair and the spill passes downstream correct any placement
    the cheaper fit gets wrong, exactly as they do for the full fit."""
    n_real, _ = x.shape
    fit_x = x
    m = fit_per_center * k
    # only subsample when it saves real traffic (>2x) AND the job is in the
    # millions-tier where that traffic is seconds-to-minutes — below 1M rows
    # the full fit stays, so every existing result (and test) is unchanged
    if (fit_per_center and m >= k
            and n_real > max(2 * m, _KMEANS_SUBSAMPLE_MIN_N)):
        fit_x = _kmeans_subsample(x, m, seed)
    fit_block = _kmeans_block(fit_x.shape[0], k, block)
    cents = _kmeans_init(fit_x, k, seed)
    for _ in range(iters):
        cents = _kmeans_iter(fit_x, cents, k=k, block=fit_block)
    if fit_x is not x:
        del fit_x  # free the (m, d) copy before the full-data pass
    kk = min(top_k, k)  # top_k=0 -> need-only mode: top_pref comes back None
    if summarize_fused and kk:
        # one gram pass -> assignment + own distance + preferences (see
        # _kmeans_summarize_fused); prefs come back u16 when bucket ids fit
        assign, own_d, top_pref = _kmeans_summarize_fused(
            x, cents, kk=kk, block_c=512,
            as_u16=k <= np.iinfo(np.uint16).max + 1,
            interpret=fused_interpret)
        return cents, assign, own_d, top_pref
    block = _kmeans_block(n_real, k, block)
    assign, own_d, top_pref = _kmeans_summarize(x, cents, kk=kk, block=block)
    return cents, assign, own_d, top_pref


def _sqdist(x: jax.Array, y: jax.Array) -> jax.Array:
    # f32 casts fuse into the reductions (tile-level, no materialized f32
    # copy) — required for bf16-resident features, harmless for f32
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    xx = jnp.sum(x * x, axis=1)[:, None]
    yy = jnp.sum(y * y, axis=1)[None, :]
    g = jax.lax.dot_general(
        x, y, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jnp.maximum(xx + yy - 2.0 * g, 0.0)


def _bucket_merge_loop(
    x: jax.Array,  # (B, d)
    count: jax.Array,  # i32 — actual items in this bucket
    n_target: jax.Array,  # i32
    max_size: jax.Array,  # i32
    update_rule: str,
    absorb_min: jax.Array | None = None,  # i32 — enables the absorb phase
):
    """Fixed-trip-count merge loop for one bucket (vmap/shard friendly)."""
    B = x.shape[0]
    idx = jnp.arange(B, dtype=jnp.int32)
    active0 = idx < count
    state = _LoopState(
        D=pairwise_ward_singleton(x.astype(jnp.float32)),
        sizes=jnp.where(active0, 1, 0).astype(jnp.int32),
        births=jnp.where(active0, idx, _BIG_I32 - B + idx),
        cents=x.astype(jnp.float32),
        active=active0,
        counter=count.astype(jnp.int32),
        num_active=count.astype(jnp.int32),
        log=jnp.zeros((max(B - 1, 1), 3), jnp.int32),
        step=jnp.int32(0),
        found=jnp.bool_(True),
    )
    # while_loop under vmap: JAX's batching rule iterates until EVERY
    # bucket's cond is false, masking finished buckets — the loop runs
    # max-merges-across-buckets times instead of a fixed B-1 trips.
    state = jax.lax.while_loop(
        lambda st: st.found & (st.num_active > n_target),
        lambda st: _merge_body(st, max_size=max_size,
                               update_rule=update_rule),
        state,
    )
    if absorb_min is not None:
        # Absorb phase (VERDICT r1 item 4): the greedy loop can leave
        # under-min clusters whose images the reference silently drops
        # (clustering.go:268-271). The bucketed engine is already an
        # approximation of the global merge order, so instead of protecting
        # that non-contract we keep merging — but ONLY pairs involving an
        # under-min cluster, still bounded by max_size. Runs on device inside
        # the same vmapped program: no host round trip, no (n, d) pull.
        state = jax.lax.while_loop(
            lambda st: st.found
            & jnp.any(st.active & (st.sizes < absorb_min)),
            lambda st: _merge_body(st, max_size=max_size,
                                   update_rule=update_rule,
                                   absorb_min=absorb_min),
            state._replace(found=jnp.bool_(True)),
        )
    return state.log, state.step, state.births, state.sizes, state.active


@partial(jax.jit, static_argnames=("update_rule", "absorb"),
         donate_argnums=())
def _bucket_chunk(feats, bucket_idx, counts, targets, max_size, min_size,
                  update_rule="lance_williams", absorb=True):
    """One chunk of buckets: gather their rows from the device-resident
    feature matrix and vmap the merge loop over the chunk's bucket axis."""
    xs = feats[bucket_idx]  # (chunk, B, d) — device-side gather, no host trip
    amin = min_size if absorb else None
    return jax.vmap(
        lambda x, c, t: _bucket_merge_loop(x, c, t, max_size, update_rule,
                                           absorb_min=amin)
    )(xs, counts, targets)


@partial(jax.jit, static_argnames=("update_rule", "absorb", "interpret"),
         donate_argnums=())
def _bucket_chunk_fused(feats, bucket_idx, counts, targets, max_size,
                        min_size, update_rule="lance_williams", absorb=True,
                        interpret=False):
    """The fused-kernel form of :func:`_bucket_chunk`: ONE explicit
    lockstep while_loop over the whole chunk whose per-iteration hot step
    is :func:`ops.pallas_kernels.merge_update_argmin_batched` — every
    bucket matrix is streamed once per merge (pending update applied in
    place + feasible-pair argmin in the same pass) instead of the unfused
    body's ~7 passes. Semantics (tie-breaks, absorb phase, per-bucket
    freezing exactly like vmap's while_loop batching rule) are identical
    to the vmapped loop — pinned by tests. Requires B % 128 == 0."""
    from imageclust_tpu.ops.pallas_kernels import merge_update_argmin_batched
    from imageclust_tpu.cluster.ward import ward_update_vector

    xs = feats[bucket_idx].astype(jnp.float32)  # (C, B, d)
    C, B, _ = xs.shape
    i32 = jnp.int32
    f32 = jnp.float32
    col = jnp.arange(B, dtype=i32)[None, :]
    active0 = col < counts[:, None]
    D = jax.vmap(pairwise_ward_singleton)(xs)
    carry = (
        D,
        active0.astype(i32),                              # sizes
        jnp.where(active0, col, _BIG_I32 - B + col),      # births
        xs,                                               # cents
        active0,                                          # active
        counts.astype(i32),                               # counter
        counts.astype(i32),                               # num_active
        jnp.zeros((C, max(B - 1, 1), 3), i32),            # log
        jnp.zeros((C,), i32),                             # step
        jnp.ones((C,), bool),                             # found
        jnp.zeros((C,), i32),                             # pending sa
        jnp.zeros((C, B), f32),                           # pending dvec
        jnp.zeros((C,), i32),                             # pending do
    )

    def make_body(amin, run_fn):
        def body(carry):
            (D, sizes, births, cents, active, counter, num_active, log,
             step, found, p_sa, p_dvec, p_do) = carry
            run = run_fn(found, num_active, active, sizes)
            D, dmin, m1, m2 = merge_update_argmin_batched(
                D, p_dvec, p_sa, p_do, births, sizes, active,
                max_size, amin, interpret=interpret)
            fin = jnp.isfinite(dmin)
            proceed = run & fin

            sa = jnp.argmax(births == m1[:, None], axis=1).astype(i32)
            sb = jnp.argmax(births == m2[:, None], axis=1).astype(i32)

            def take1(arr, idxs):
                return jnp.take_along_axis(arr, idxs[:, None], axis=1)[:, 0]

            s_a = take1(sizes, sa)
            s_b = take1(sizes, sb)
            s_new = s_a + s_b
            c_a = jnp.take_along_axis(cents, sa[:, None, None], axis=1)[:, 0]
            c_b = jnp.take_along_axis(cents, sb[:, None, None], axis=1)[:, 0]
            c_new = (s_a.astype(f32)[:, None] * c_a
                     + s_b.astype(f32)[:, None] * c_b) \
                / s_new.astype(f32)[:, None]
            d_a = jnp.take_along_axis(D, sa[:, None, None], axis=1)[:, 0]
            d_b = jnp.take_along_axis(D, sb[:, None, None], axis=1)[:, 0]
            d_ab = take1(d_a, sb)
            dvec = jax.vmap(
                lambda szf, saf, sbf, snf, da, db, dab, ce, cn:
                ward_update_vector(
                    update_rule, sizes_f=szf, s_a_f=saf, s_b_f=sbf,
                    s_new_f=snf, d_a=da, d_b=db, d_ab=dab,
                    cents=ce, c_new=cn)
            )(sizes.astype(f32), s_a.astype(f32), s_b.astype(f32),
              s_new.astype(f32), d_a, d_b, d_ab, cents, c_new)
            is_sa = col == sa[:, None]
            is_sb = col == sb[:, None]
            dvec = jnp.where(is_sa, 0.0, dvec)

            new_birth = counter
            pro = proceed[:, None]
            sizes = jnp.where(pro & is_sa, s_new[:, None],
                              jnp.where(pro & is_sb, 0, sizes))
            births = jnp.where(pro & is_sa, new_birth[:, None], births)
            if update_rule == "centroid":  # LW never reads cents
                cents = jnp.where((pro & is_sa)[:, :, None],
                                  c_new[:, None, :], cents)
            active = jnp.where(pro & is_sb, False, active)
            rows = jnp.arange(log.shape[1], dtype=i32)[None, :]
            hit = (rows == step[:, None]) & pro
            triple = jnp.stack([m1, m2, new_birth], axis=1)
            log = jnp.where(hit[:, :, None], triple[:, None, :], log)
            counter = jnp.where(proceed, counter + 1, counter)
            num_active = jnp.where(proceed, num_active - 1, num_active)
            step = jnp.where(proceed, step + 1, step)
            found = jnp.where(run, fin, found)
            p_sa = jnp.where(proceed, sa, p_sa)
            p_dvec = jnp.where(pro, dvec, p_dvec)
            p_do = jnp.where(run, fin.astype(i32), p_do)
            return (D, sizes, births, cents, active, counter, num_active,
                    log, step, found, p_sa, p_dvec, p_do)

        return body

    def main_run(found, num_active, active, sizes):
        return found & (num_active > targets)

    carry = jax.lax.while_loop(
        lambda c: jnp.any(c[9] & (c[6] > targets)),
        make_body(jnp.int32(-1), main_run),
        carry,
    )
    if absorb:
        def absorb_run(found, num_active, active, sizes):
            return found & jnp.any(active & (sizes < min_size), axis=1)

        carry = (*carry[:9], jnp.ones((C,), bool), *carry[10:])
        carry = jax.lax.while_loop(
            lambda c: jnp.any(
                c[9] & jnp.any(c[4] & (c[1] < min_size), axis=1)),
            make_body(jnp.asarray(min_size, i32), absorb_run),
            carry,
        )
    return carry[7], carry[8], carry[2], carry[1], carry[4]


@partial(jax.jit, static_argnames=("absorb", "interpret"),
         donate_argnums=())
def _bucket_chunk_whole(feats, bucket_idx, counts, targets, max_size,
                        min_size, absorb=True, interpret=False):
    """The whole-loop-in-VMEM form of :func:`_bucket_chunk`: every bucket's
    COMPLETE merge loop (main + absorb) runs inside one Pallas program
    (ops.pallas_kernels.merge_loop_whole) with the (B, B) matrix resident
    in VMEM scratch — it crosses HBM once per bucket instead of once per
    lockstep merge iteration (the dominant HBM traffic + per-iteration
    dispatch overhead of the 10M tier's bucket-merges phase under
    :func:`_bucket_chunk_fused`). Lance-Williams only (the recurrence
    never reads centroids); results are identical to the other two loop
    forms — test-pinned. Requires B % 128 == 0."""
    from imageclust_tpu.ops.pallas_kernels import merge_loop_whole

    xs = feats[bucket_idx].astype(jnp.float32)  # (C, B, d)
    D = jax.vmap(pairwise_ward_singleton)(xs)
    del xs
    amin = jnp.where(jnp.bool_(absorb), jnp.asarray(min_size, jnp.int32),
                     jnp.int32(0))
    return merge_loop_whole(D, counts, targets, max_size, amin,
                            interpret=interpret)


def _chunk_width(bucket_size: int, d: int) -> int:
    """Buckets per dispatch. Two forces: the per-chunk working set
    (gathered rows chunk*B*d + distance matrices chunk*B^2) must stay
    ~<= 2 GB so it never mirrors the whole feature matrix in HBM, and the
    chunk should be as WIDE as that allows — the vmapped while_loop runs
    ~B iterations per chunk regardless of width, so narrow chunks multiply
    per-iteration dispatch overhead by the chunk count (measured at
    10M x 64 / B=256: 51 chunks of 1024 = 72 s of merge time, ~5 ms per
    iteration of overhead; 4096-wide chunks amortize it 4x)."""
    per_bucket = bucket_size * 4 * max(d, bucket_size)
    cap = max(1, (2 << 30) // max(1, per_bucket))  # never exceed ~2 GB
    # largest power of two within the cap (an earlier 256-bucket FLOOR here
    # overrode the cap: with B=4096 buckets of 67 MB it gathered ~16 GB per
    # dispatch, and past B=32k the shift count went negative)
    return min(4096, 1 << (cap.bit_length() - 1))


def _chunk_width_whole(bucket_size: int, d: int) -> int:
    """Buckets per dispatch for the whole-loop kernel path. Unlike the
    lockstep loop, one dispatch runs each bucket's ENTIRE merge loop, so
    there is no per-iteration overhead to amortize with width — the cap
    only bounds the dispatch working set (gathered rows C*B*d + matrices
    C*B^2 + the (C, B, 128) log block) to ~1 GB so the transient never
    crowds the resident feature matrix at the 10M tiers."""
    per_bucket = bucket_size * 4 * (d + bucket_size + 128)
    cap = max(1, (1 << 30) // max(1, per_bucket))
    return min(1024, 1 << (cap.bit_length() - 1))


def _all_buckets(feats, bucket_idx, counts, targets, max_size, min_size,
                 update_rule="lance_williams", absorb=True):
    """Single-device bucket engine, chunked over the bucket axis. Each
    chunk dispatches independently (the chunks pipeline on device); outputs
    are concatenated on the host side as numpy by the caller.

    The per-chunk merge loop runs the fused-kernel form
    (:func:`_bucket_chunk_fused`) whenever the bucket width is
    stripe-aligned and the fused path is enabled (same
    IMAGECLUST_FUSED_MERGE policy as the exact engine: default on TPU,
    "1" forces interpret mode off-TPU for tests, "0" opts out) — the
    vmapped unfused loop otherwise; both are result-identical
    (test-pinned)."""
    from imageclust_tpu.cluster.ward import _use_fused_loop

    B = int(bucket_idx.shape[1])
    whole = False
    if B >= 128 and B % 128 == 0 and _use_fused_loop():
        interp = jax.default_backend() != "tpu"
        if (update_rule == "lance_williams"
                and os.environ.get("IMAGECLUST_WHOLE_MERGE", "1") != "0"):
            chunk = partial(_bucket_chunk_whole, absorb=absorb,
                            interpret=interp)
            whole = True
        else:
            chunk = partial(_bucket_chunk_fused, update_rule=update_rule,
                            absorb=absorb, interpret=interp)
    else:
        chunk = partial(_bucket_chunk, update_rule=update_rule,
                        absorb=absorb)
    nb = bucket_idx.shape[0]
    d_feat = int(feats.shape[1])
    chunk_w = _chunk_width_whole(B, d_feat) if whole \
        else _chunk_width(B, d_feat)
    if nb <= chunk_w:
        return chunk(feats, bucket_idx, counts, targets, max_size, min_size)
    # Count-sorted chunking: each chunk's lockstep while_loop runs until its
    # SLOWEST bucket finishes, so mixing a near-full bucket into every chunk
    # makes all of them pay ~max-count iterations. Sorting buckets by count
    # (descending) groups similar iteration needs per chunk — total lockstep
    # iterations drop from chunks*max(count) toward sum of per-chunk maxima.
    # Each bucket's own merge loop is independent of chunk placement and the
    # outputs are restored to caller order below, so results are identical.
    # (IMAGECLUST_SORTED_CHUNKS=0 opts out, for A/B measurement)
    counts_h = np.asarray(counts)
    if os.environ.get("IMAGECLUST_SORTED_CHUNKS", "1") == "0":
        order = np.arange(nb, dtype=np.int32)
    else:
        order = np.argsort(-counts_h, kind="stable").astype(np.int32)
    identity_order = np.array_equal(order, np.arange(nb, dtype=np.int32))
    if not identity_order:
        order_d = jnp.asarray(order)
        bucket_idx = bucket_idx[order_d]
        counts = counts[order_d]
        targets = targets[order_d]
    inv = np.empty_like(order)
    inv[order] = np.arange(nb, dtype=np.int32)
    outs = []
    for s in range(0, nb, chunk_w):
        e = min(s + chunk_w, nb)
        # pad the tail chunk to the full chunk width (empty buckets merge
        # zero times) so every dispatch shares ONE compiled shape
        pad = chunk_w - (e - s)
        bi = bucket_idx[s:e]
        ct = counts[s:e]
        tg = targets[s:e]
        if pad:
            bi = jnp.concatenate(
                [bi, jnp.zeros((pad, bi.shape[1]), bi.dtype)])
            ct = jnp.concatenate([ct, jnp.zeros(pad, ct.dtype)])
            tg = jnp.concatenate([tg, jnp.zeros(pad, tg.dtype)])
        out = chunk(feats, bi, ct, tg, max_size, min_size)
        outs.append(out if not pad
                    else tuple(o[: e - s] for o in out))
    if identity_order:
        # the [inv] gather would be a full no-op copy of every
        # (nb, steps, 3)-scale output — skip it when order is identity
        return tuple(jnp.concatenate([o[i] for o in outs])
                     for i in range(len(outs[0])))
    inv_d = jnp.asarray(inv)
    return tuple(jnp.concatenate([o[i] for o in outs])[inv_d]
                 for i in range(len(outs[0])))


def _plan_exchange(buckets, n_pad_rows: int, ndev: int, bucket_size: int):
    """Host-side plan for the owner-aligned feature exchange: every bucket
    member row moves from the device owning its feature shard to the device
    owning its bucket, as one all_to_all — the rows move ONCE, O(n/D) per
    device, instead of replicating the (n, d) matrix everywhere (round-1
    ROADMAP gap 3 / VERDICT item 6; the 10M tier's blocker).

    Returns (send_idx (D, D, K), recv_pos (D, D, K), K): device sd sends its
    local rows send_idx[sd, dd, :] to device dd; device dd scatters the
    packet from sd into flat (bucket_local * B + slot) positions
    recv_pos[dd, sd, :] (out-of-range = padding, dropped on scatter). K pads
    to a power of two to bound recompilation."""
    r = n_pad_rows // ndev
    nb = len(buckets)
    nb_local = nb // ndev
    per: list[list[list[tuple[int, int]]]] = [
        [[] for _ in range(ndev)] for _ in range(ndev)
    ]
    for bi, members in enumerate(buckets):
        dd = bi // nb_local
        bl = bi % nb_local
        for slot, g in enumerate(members):
            per[g // r][dd].append((g % r, bl * bucket_size + slot))
    K = max(
        (len(per[sd][dd]) for sd in range(ndev) for dd in range(ndev)),
        default=1,
    )
    K = max(1, 1 << max(K - 1, 0).bit_length())
    send_idx = np.zeros((ndev, ndev, K), np.int32)
    recv_pos = np.full((ndev, ndev, K), np.int32(1 << 30), np.int32)
    for sd in range(ndev):
        for dd in range(ndev):
            for k, (src, pos) in enumerate(per[sd][dd]):
                send_idx[sd, dd, k] = src
                recv_pos[dd, sd, k] = pos
    return send_idx, recv_pos, K


def _to_host(x) -> np.ndarray:
    """Device->host pull that also works for GLOBAL arrays in a
    multi-process run (shard_map outputs sharded over a mesh spanning
    several processes are not fully addressable — np.asarray would throw)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def _mesh_is_multiprocess(mesh: Mesh) -> bool:
    me = jax.process_index()
    return any(d.process_index != me for d in mesh.devices.flat)


_MESH_BUCKET_LOOPS: dict = {}


def _all_buckets_mesh(mesh: Mesh, update_rule: str, absorb: bool,
                      bucket_size: int):
    """shard_map bucket engine: features stay row-sharded over 'data', the
    exchange is one all_to_all, and each device runs the vmapped merge loop
    over ITS buckets only. No step replicates the feature matrix."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    key = (mesh, update_rule, absorb, bucket_size)
    if key in _MESH_BUCKET_LOOPS:
        return _MESH_BUCKET_LOOPS[key]

    def body(feats_l, send_idx_l, recv_pos_l, counts_l, targets_l,
             max_size, min_size):
        d = feats_l.shape[1]
        B_cap = bucket_size
        nb_local = counts_l.shape[0]
        send = feats_l[send_idx_l[0]]  # (D, K, d)
        recv = jax.lax.all_to_all(send, "data", split_axis=0, concat_axis=0,
                                  tiled=False)
        flat_pos = recv_pos_l[0].reshape(-1)
        xs_flat = jnp.zeros((nb_local * B_cap, d), feats_l.dtype)
        xs_flat = xs_flat.at[flat_pos].set(recv.reshape(-1, d), mode="drop")
        xs = xs_flat.reshape(nb_local, B_cap, d)
        amin = min_size if absorb else None
        return jax.vmap(
            lambda x, c, t: _bucket_merge_loop(
                x, c, t, max_size, update_rule, absorb_min=amin)
        )(xs, counts_l, targets_l)

    P_b = P("data")
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P("data", None), P("data", None, None),
                  P("data", None, None), P_b, P_b, P(), P()),
        out_specs=(P_b, P_b, P_b, P_b, P_b),
        check_vma=False,
    )
    _MESH_BUCKET_LOOPS[key] = jax.jit(fn)
    return _MESH_BUCKET_LOOPS[key]


def _repair_buckets(
    assign: np.ndarray,
    own_d: np.ndarray,
    top_pref: np.ndarray,
    n_buckets: int,
    capacity: int,
    min_size: int,
) -> list[list[int]]:
    """Host-side capacity repair over per-item summaries: every bucket ends
    with min_size <= len <= capacity; spilled items go to the nearest
    preferred bucket with space.

    Thin wrapper: computes bucket counts and each item's RANK within its
    bucket (by own-centroid distance, ties by item id) on the host, then
    delegates to :func:`_repair_from_summaries`. The engine's fast path
    (:func:`_repair_buckets_device`) computes the identical summaries ON
    DEVICE so ``own_d`` and the full (n, 8) preference matrix never cross
    the host link — ~360 of the ~400 MB the repair phase used to pull at
    the 10M tier (the phase was measured d-INDEPENDENT at 50-79 s: pure
    transfer + host numpy). This wrapper is the oracle the equivalence
    fuzz pins that path against."""
    n = len(assign)
    counts0 = np.bincount(assign, minlength=n_buckets)
    # stable lexsort: equal own_d within a bucket keeps ascending item
    # order — the exact tie-break the old per-overflow-bucket sort had
    perm = np.lexsort((own_d, assign))
    offs0 = np.concatenate([[0], np.cumsum(counts0[:-1])])
    rank = np.empty(n, np.int64)
    rank[perm] = np.arange(n) - np.repeat(offs0, counts0)
    return _repair_from_summaries(assign, rank, counts0, top_pref,
                                  n_buckets, capacity, min_size)


def _repair_from_summaries(
    assign: np.ndarray,
    rank: np.ndarray,
    counts0: np.ndarray,
    top_pref,
    n_buckets: int,
    capacity: int,
    min_size: int,
) -> list[list[int]]:
    """Capacity repair from (assign, rank-in-bucket, counts) summaries.
    ``top_pref`` only needs ``__getitem__`` over spill items and members
    of under-min buckets — the device path passes a :class:`_SparsePrefs`
    holding just those rows, the oracle path passes the full matrix."""
    # vectorized grouping (a 10M-iteration python append loop costs ~10 s
    # at the top tier); stable argsort keeps ascending item order per
    # bucket — identical to the sequential appends
    st = _StepTimer("from-summaries")
    order = np.argsort(assign, kind="stable")
    buckets: list[list[int]] = [
        s.tolist() for s in np.split(order, np.cumsum(counts0)[:-1])]
    st.tick("group-tolist")

    # Spill overflow: keep the `capacity` closest items, re-home the rest.
    # The non-preferred fallback uses a monotone cursor instead of place()'s
    # from-zero scan: during this phase buckets only FILL (nothing empties),
    # so "first bucket with space" never moves backwards — the cursor makes
    # the fallback amortized O(n) where rescanning was quadratic once the
    # popular buckets filled (measured: the dominant host cost at 300k+).
    # The spill source `b` is full by construction, so the cursor never
    # lands on it; placements are identical to the old scan.
    #
    # Overflow buckets never RECEIVE spills (place targets have room, so
    # they fill at most TO capacity), so every overflow bucket still holds
    # exactly its original members when processed — all the keep/spill
    # sorts are precomputed in one vectorized pass instead of ~10k python
    # sorted() calls over millions of items (measured 8+ host seconds at
    # the 10M tier).
    over_b = np.flatnonzero(counts0 > capacity)
    spill_sorted: dict[int, np.ndarray] = {}
    if len(over_b):
        offs = np.concatenate([[0], np.cumsum(counts0)])
        # ONE stable lexsort over all overflow members by (bucket, own_d)
        # — per-bucket argsort calls cost ~4x as much in small-array
        # overhead at 10k+ overflow buckets
        mem_all = np.concatenate(
            [order[offs[b]:offs[b + 1]] for b in over_b])
        bid_all = np.repeat(over_b, counts0[over_b])
        # rank is unique within a bucket and ordered by (own_d, item id),
        # so sorting by rank reproduces the old (own_d, item-order) sort
        perm = np.lexsort((rank[mem_all], bid_all))
        srt_all = mem_all[perm]
        bounds = np.concatenate([[0], np.cumsum(counts0[over_b])])
        for z, b in enumerate(over_b):
            spill_sorted[int(b)] = srt_all[bounds[z]:bounds[z + 1]]
    st.tick("overflow-sort")
    # The placement loop itself runs CHUNKED-VECTORIZED with an exact-
    # semantics guard: for a chunk of spill items, every row's first
    # in-preference bucket with room is computed against the chunk-START
    # counts; the whole chunk bulk-applies iff (a) no chosen bucket's
    # in-chunk demand exceeds its room and (b) every row found an eligible
    # preference. Under (a) no chosen bucket fills mid-chunk (and full
    # buckets stay full — this phase only fills), so the sequential scan
    # would have picked the same buckets; chunks violating the guard
    # replay through the per-item python loop. Placements are appended to
    # per-bucket lists at phase end via one stable grouping pass
    # (processing order preserved). Measured at the 10M tier this takes
    # the phase from ~24 s of python scanning to ~2 s.
    cnt = counts0.astype(np.int64)
    cnt[over_b] = capacity
    placed_items: list[np.ndarray] = []
    placed_into: list[np.ndarray] = []
    cursor = 0
    CH = 8192

    # The placement scan is inherently sequential (every placement depends
    # on all earlier counts), so its fast path is the native C runtime —
    # bit-identical to the per-item Python loop below, which remains both
    # the no-.so fallback and the equivalence-test oracle. The chunked-
    # vectorized numpy path stays for the fallback because contended
    # preferences degrade it to per-item Python (measured ~10 s per 1.4M
    # contended items at the 10M tier vs ~10 ms native).
    spills = [spill_sorted[int(b)][capacity:] for b in over_b]
    for b in over_b:
        buckets[int(b)] = spill_sorted[int(b)][:capacity].tolist()
    native_res = None
    if spills and sum(len(s) for s in spills):
        from imageclust_tpu.data.native import native_spill_place

        spill_all = np.concatenate(spills)
        src_all = np.repeat(over_b.astype(np.int32),
                            [len(s) for s in spills])
        native_res = native_spill_place(
            top_pref[spill_all], src_all, cnt, capacity, cursor)
    if native_res is not None:
        placed_items.append(spill_all)
        placed_into.append(native_res[0].astype(np.int64))
        cursor = native_res[1]
    st.tick("spill-keep+place")

    def _bulk_try(b: int, chunk: np.ndarray) -> bool:
        prefs = top_pref[chunk]  # (C, P)
        elig = (prefs != b) & (cnt[prefs] < capacity)
        if not elig.any(axis=1).all():
            return False  # some row needs the cursor fallback
        j = np.argmax(elig, axis=1)
        chosen = prefs[np.arange(len(chunk)), j]
        hot, dem = np.unique(chosen, return_counts=True)
        if (dem > capacity - cnt[hot]).any():
            return False  # a chosen bucket would fill mid-chunk
        placed_items.append(chunk)
        placed_into.append(chosen.astype(np.int64))
        cnt[hot] += dem
        return True

    def _place(b: int, chunk: np.ndarray) -> None:
        nonlocal cursor
        if _bulk_try(b, chunk):
            return
        if len(chunk) > 128:  # bisect: only the offending tail replays
            h = len(chunk) // 2
            _place(b, chunk[:h])
            _place(b, chunk[h:])
            return
        seq_i: list[int] = []
        seq_t: list[int] = []
        for i in chunk:
            i = int(i)
            placed = False
            for nb in top_pref[i]:
                nb = int(nb)
                if nb != b and cnt[nb] < capacity:
                    seq_i.append(i)
                    seq_t.append(nb)
                    cnt[nb] += 1
                    placed = True
                    break
            if not placed:
                while cursor < n_buckets and cnt[cursor] >= capacity:
                    cursor += 1
                nb = cursor if cursor < n_buckets else b
                seq_i.append(i)
                seq_t.append(nb)
                cnt[nb] += 1
        placed_items.append(np.asarray(seq_i, dtype=np.int64))
        placed_into.append(np.asarray(seq_t, dtype=np.int64))

    if native_res is None:
        for z, b in enumerate(over_b):
            spill = spills[z]
            for s in range(0, len(spill), CH):
                _place(int(b), spill[s:s + CH])
    if placed_items:
        items_all = np.concatenate(placed_items)
        into_all = np.concatenate(placed_into)
        o2 = np.argsort(into_all, kind="stable")
        tgt, starts = np.unique(into_all[o2], return_index=True)
        ends = np.append(starts[1:], len(o2))
        srt_items = items_all[o2]
        for t, s0, s1 in zip(tgt.tolist(), starts.tolist(), ends.tolist()):
            buckets[t].extend(srt_items[s0:s1].tolist())
    st.tick("placement-apply")

    # Dissolve under-min buckets into the members' preferred buckets. The
    # fallback only targets buckets that are already viable (>= min_size) —
    # refilling an emptied bucket would just recreate an under-min bucket
    # whose images get dropped later. Iterate to a fixpoint: a dissolve can
    # push another bucket to capacity but never creates new under-min ones.
    #
    # ``lens`` mirrors len(buckets[x]) so the preference-exhausted fallback
    # is a C-speed boolean mask + argmax ("first bucket satisfying the
    # predicate") instead of an O(n_buckets) python scan per item.
    lens = np.fromiter((len(x) for x in buckets), np.int64, n_buckets)

    def place(i: int, avoid: int, lo: int) -> bool:
        # predicate: lo <= len(bucket) < capacity, bucket != avoid
        for nb in top_pref[i]:
            nb = int(nb)
            if nb != avoid and lo <= lens[nb] < capacity:
                buckets[nb].append(i)
                lens[nb] += 1
                return True
        mask = (lens >= lo) & (lens < capacity)
        mask[avoid] = False
        nb = int(np.argmax(mask))
        if mask[nb]:  # preference list exhausted: first bucket with space
            buckets[nb].append(i)
            lens[nb] += 1
            return True
        return False

    for _ in range(n_buckets):
        changed = False
        for b in range(n_buckets):
            if 0 < lens[b] < min_size:
                members, buckets[b] = buckets[b], []
                lens[b] = 0
                for i in members:
                    # prefer viable buckets; else any NONEMPTY bucket with
                    # space (consolidating two under-min buckets can lift
                    # one above min_size — the fixpoint loop re-checks);
                    # never refill an emptied bucket
                    if not place(i, b, min_size):
                        if not place(i, b, 1):
                            buckets[b].append(i)  # nowhere viable: keep
                            lens[b] += 1
                if not lens[b]:
                    changed = True
        if not changed:
            break
    st.tick("dissolve-under-min")
    return [b for b in buckets if b]


def _repair_from_summaries_fast(
    assign: np.ndarray,
    rank: np.ndarray,
    counts0: np.ndarray,
    top_pref,
    n_buckets: int,
    capacity: int,
    min_size: int,
    into: np.ndarray | None = None,
    fetch_rows=None,
) -> list[np.ndarray] | None:
    """Array-based capacity repair — placement-identical to
    :func:`_repair_from_summaries` (the oracle the equivalence fuzz pins
    this against) but with no per-item Python list bookkeeping: bucket
    membership stays as numpy views/concats until the very end. At the 10M
    tier the list path's ``tolist``/``extend`` passes measured ~19 s of
    the repair phase (IMAGECLUST_REPAIR_PROFILE step logs in BASELINE.md);
    this path does the same work in a handful of vectorized passes.

    Requires the native placement loop (the inherently sequential part).
    ``into`` — when given — is the VALIDATED PREFIX of per-item target
    buckets computed by the device placement
    (:func:`_device_spill_place`), in the same (bucket asc, rank asc)
    spill order this function derives; the suffix (items past the first
    pref-list exhaustion, usually none) replays through the native loop
    with rows fetched by item id via ``fetch_rows(items) ->
    (len(items), kk)``, which also serves the dissolve loop's (tiny)
    under-min family. Returns None when the .so is unavailable (the
    caller falls back to the list path). Returns a list of np.ndarray
    member blocks (ascending item order for non-overflow buckets;
    own-distance rank order for the kept members of overflow buckets —
    exactly the oracle's order)."""
    from imageclust_tpu.data.native import available, native_spill_place

    if not available():
        return None
    st = _StepTimer("fast-repair")
    n = len(assign)
    counts0 = counts0.astype(np.int64)
    order = np.argsort(assign, kind="stable")
    offs = np.concatenate([[0], np.cumsum(counts0)])
    segs = np.split(order, offs[1:-1])  # views: ascending item order
    st.tick("group")

    over_b = np.flatnonzero(counts0 > capacity)
    cnt = counts0.copy()
    keeps: dict[int, np.ndarray] = {}
    spill_all = np.empty(0, np.int64)
    src_all = np.empty(0, np.int32)
    if len(over_b):
        # Sort all overflow members by (bucket, rank) with ONE scatter:
        # rank (computed on device) is unique per bucket and ordered by
        # (own_d, item id), so position bucket_base + rank reproduces the
        # oracle's per-bucket (own_d, item) sort — no host lexsort (which
        # measured seconds over the ~7M-row overflow set at the 10M tier)
        mem_all = np.concatenate([segs[b] for b in over_b])
        oc = counts0[over_b]
        bounds = np.concatenate([[0], np.cumsum(oc)])
        grp = np.repeat(np.arange(len(over_b)), oc)
        srt_all = np.empty(len(mem_all), mem_all.dtype)
        srt_all[bounds[grp] + rank[mem_all]] = mem_all
        keep_mask = rank[srt_all] < capacity
        keeps_all = srt_all[keep_mask]
        for z, blk in enumerate(
                np.split(keeps_all, capacity * np.arange(1, len(over_b)))):
            keeps[int(over_b[z])] = blk
        # srt_all is (bucket asc, rank asc): the masked tail equals the
        # oracle's per-bucket spill concatenation, in the same order
        spill_all = srt_all[~keep_mask]
        src_all = np.repeat(over_b, oc)[~keep_mask].astype(np.int32)
        cnt[over_b] = capacity
    st.tick("overflow-split")

    placed_by_tgt: dict[int, np.ndarray] = {}
    if len(spill_all):
        if into is not None:
            # device placement: same spill order by construction (bucket
            # asc, rank asc on both sides) — apply the validated prefix,
            # then replay any exhaustion suffix through the native loop
            # (cursor starts at 0: no fallback happened in the prefix)
            k0 = len(into)
            assert k0 <= len(spill_all), (k0, len(spill_all))
            if k0:
                np.add.at(cnt, into, 1)
            st.tick("device-place-apply")
            if k0 < len(spill_all):
                tail_pref = fetch_rows(spill_all[k0:])
                st.tick("tail-pref-fetch")
                res = native_spill_place(
                    tail_pref, src_all[k0:], cnt, capacity, 0)
                if res is None:
                    return None
                st.tick("native-place")
                into = np.concatenate([into, res[0].astype(np.int64)])
        else:
            spill_pref = top_pref[spill_all]  # first read: blocks on the
            st.tick("pref-wait")              # (async) device->host copy
            res = native_spill_place(spill_pref, src_all, cnt, capacity, 0)
            if res is None:  # lib vanished between probe and call
                return None
            st.tick("native-place")
            into, _ = res  # cnt now equals the live bucket lengths
            if st.on:  # how useful were the pref lists at this tier?
                in_pref = int((spill_pref == into[:, None]).any(1).sum())
                log.info(
                    "spill placement: %d of %d via pref lists (%.1f%%), "
                    "%d via the cursor fallback", in_pref, len(into),
                    100.0 * in_pref / max(len(into), 1),
                    len(into) - in_pref)
        o2 = np.argsort(into, kind="stable")
        tgt, starts = np.unique(into[o2], return_index=True)
        ends = np.append(starts[1:], len(o2))
        srt_items = spill_all[o2]
        for t, s0, s1 in zip(tgt.tolist(), starts.tolist(), ends.tolist()):
            placed_by_tgt[t] = srt_items[s0:s1]
    st.tick("place")

    if fetch_rows is not None and top_pref is None:
        # no preference rows crossed the link for placement — fetch just
        # the dissolve family: members of every bucket that is under-min
        # AFTER placement (only such buckets can ever dissolve: appends
        # monotonically grow buckets, so the fixpoint loop's candidate set
        # never leaves this snapshot), plus the spill items placed into
        # them (a dissolving bucket re-places its placed-ins too)
        lut = np.zeros(n_buckets, bool)
        lut[(cnt > 0) & (cnt < min_size)] = True
        fam = [np.flatnonzero(lut[assign])]  # under-min buckets can never
        if len(spill_all) and into is not None:  # be overflow buckets
            fam.append(spill_all[lut[into]])
        family = np.unique(np.concatenate(fam))
        rows = fetch_rows(family) if len(family) else \
            np.zeros((0, 1), np.int32)
        top_pref = _SparsePrefs(n, family, rows)
    st.tick("family-fetch")

    # Dissolve under-min buckets — same fixpoint loop as the oracle, but
    # membership is materialized only for the (few) buckets that dissolve.
    # ``lens`` IS ``cnt``: counts clipped to capacity plus placements.
    lens = cnt
    appends: dict[int, list] = {}
    dissolved = np.zeros(n_buckets, bool)

    def members_of(b: int) -> np.ndarray:
        parts = []
        if not dissolved[b]:
            parts.append(keeps[b] if b in keeps else segs[b])
            if b in placed_by_tgt:
                parts.append(placed_by_tgt[b])
        ap = appends.get(b)
        if ap:
            parts.append(np.asarray(ap, np.int64))
        if not parts:
            return np.empty(0, np.int64)
        return parts[0] if len(parts) == 1 else np.concatenate(parts)

    def place(i: int, avoid: int, lo: int) -> bool:
        for nb in top_pref[i]:
            nb = int(nb)
            if nb != avoid and lo <= lens[nb] < capacity:
                appends.setdefault(nb, []).append(i)
                lens[nb] += 1
                return True
        mask = (lens >= lo) & (lens < capacity)
        mask[avoid] = False
        nb = int(np.argmax(mask))
        if mask[nb]:
            appends.setdefault(nb, []).append(i)
            lens[nb] += 1
            return True
        return False

    # appends never push a bucket under min_size and dissolves zero it, so
    # no bucket OUTSIDE the current under-min snapshot can enter it — the
    # ascending snapshot sweep visits exactly the buckets the oracle's
    # range(n_buckets) sweep would (each re-checked at visit time, since an
    # earlier dissolve may have lifted it past min_size)
    for _ in range(n_buckets):
        changed = False
        for b in np.flatnonzero((lens > 0) & (lens < min_size)).tolist():
            if not 0 < lens[b] < min_size:
                continue
            members = members_of(b)
            dissolved[b] = True
            appends[b] = []
            lens[b] = 0
            for i in members:
                i = int(i)
                if not place(i, b, min_size):
                    if not place(i, b, 1):
                        appends[b].append(i)  # nowhere viable: keep
                        lens[b] += 1
            if not lens[b]:
                changed = True
        if not changed:
            break
    st.tick("dissolve-under-min")
    out = [members_of(b) for b in range(n_buckets) if lens[b] > 0]
    st.tick("assemble")
    return out


@partial(jax.jit, static_argnames=("nb",))
def _repair_summaries(assign, own_d, nb, capacity, min_size):
    """On-device per-item repair summaries: bucket counts, each item's
    rank within its bucket ordered by (own-centroid distance, item id) —
    everything capacity repair needs from ``own_d``, in n*4 bytes instead
    of transferring own_d itself and re-sorting on the host — plus the
    need mask (items whose preference rows repair can legally read:
    spilled rank >= capacity members of over-capacity buckets, or members
    of under-min buckets) and its count, so the need-only preference
    compute can launch BEFORE the host pulls assign/rank (the mask is the
    same predicate the host applies to the pulled copies). The lexsort
    is stable, so tied distances keep ascending item order — identical to
    the host oracle's tie-break."""
    n = assign.shape[0]
    counts = jnp.bincount(assign, length=nb).astype(jnp.int32)
    offs = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    perm = jnp.lexsort((own_d, assign))
    rank_vals = jnp.arange(n, dtype=jnp.int32) - jnp.repeat(
        offs, counts, total_repeat_length=n)
    rank = jnp.zeros(n, jnp.int32).at[perm].set(rank_vals)
    ca = counts[assign]
    need = ((ca > capacity) & (rank >= capacity)) | (ca < min_size)
    return counts, rank, need, jnp.sum(need, dtype=jnp.int32)


@partial(jax.jit, static_argnames=("m_pad",))
def _need_idx(mask, m_pad):
    """Ascending indices of the need mask, zero-padded to ``m_pad`` —
    the device twin of the host's ``np.flatnonzero`` (both ascending, same
    mask), used only to feed the preference-row gather."""
    return jnp.nonzero(mask, size=m_pad, fill_value=0)[0].astype(jnp.int32)


@partial(jax.jit, static_argnames=("as_u16",))
def _gather_pref_rows(pref, idx, as_u16):
    """Gather preference rows for the (padded) item set repair can
    actually read; uint16 halves the transfer when bucket ids fit."""
    rows = pref[idx]
    return rows.astype(jnp.uint16) if as_u16 else rows


@jax.jit
def _rank_u16(rank):
    return rank.astype(jnp.uint16)


def _use_device_place() -> bool:
    """Device-side spill placement (deferred acceptance == serial
    first-fit): OPT-IN via IMAGECLUST_DEVICE_PLACE=1. Built to replace the
    (m, 8) preference-row pull (~120 MB at the 10M tier, wall-clock on the
    1-CPU host), it is exact and fuzz-pinned — but MEASURED USELESS at the
    flagship tier: the subsampled Lloyd fit leaves dense regions uniformly
    over capacity, so the very first spill item's 8 nearest buckets are
    all full (first_bad=0, BASELINE round 5) and every run replays on the
    host anyway, paying ~3.5 s of DA device time plus a late row gather
    for nothing. Default off until a tier with local slack shows up; the
    engine-identity and prefix-validity tests keep the path honest."""
    return os.environ.get("IMAGECLUST_DEVICE_PLACE", "") == "1"


# device-placement chunk width: the DA rounds sort (chunk,) claim arrays
# inside a while_loop — at full spill width (8M+) the TPU compile of
# sort-inside-loop explodes (observed: 20+ min, vs ~20 s at 64k), and the
# per-round sort cost scales with the whole width though contention is
# local. Chunks are processed in priority order (outer scan), so
# exactness is preserved: every higher-priority chunk is FINAL before the
# next begins.
_DP_CHUNK = 1 << 17


@partial(jax.jit, static_argnames=("m_pad", "max_rounds"))
def _device_spill_place(assign, rank, counts, pref_mat, capacity,
                        m_pad: int, max_rounds: int = 32):
    """Spill placement ON DEVICE — the serial first-fit loop
    (native ``ic_spill_place``) computed by deferred acceptance.

    The serial rule: items in (source-bucket asc, rank asc) order each take
    their first preference with remaining capacity (skipping their own
    bucket). That is a serial dictatorship with a COMMON priority order
    (the item's position in that global order), and serial dictatorship is
    exactly item-proposing deferred acceptance when every bucket ranks
    claimants by the same priority: per round, every unplaced item
    proposes its next untried preference; each bucket TENTATIVELY holds
    the highest-priority claimants (current holders + new proposers) up to
    its remaining capacity and evicts the rest; evicted/rejected items
    advance. Acceptance is tentative, which is what makes the emulation
    exact — a finalized-acceptance scheme diverges (a low-priority item
    can grab a slot a higher-priority item only reaches in a later round).

    Items are processed in priority-ordered CHUNKS of ``_DP_CHUNK`` (outer
    ``scan``, remaining capacity carried across chunks): all of chunk c's
    placements are final before chunk c+1 starts, so the chunked run
    equals the global one while the per-round sort stays chunk-sized.

    Returns ``(into (m_pad,) i32 [-1 unresolved], n_spill i32,
    first_bad i32)``. ``first_bad`` is the priority index of the FIRST
    unresolved real item (= n_spill when every item placed): an item that
    exhausted its preference list takes the serial loop's monotone-cursor
    fallback, which interleaves with later placements and cannot be
    reproduced by rounds — but an item's outcome depends only on
    higher-priority items, so placements BEFORE first_bad are exact and
    the caller replays only the [first_bad:] suffix on the host."""
    p = pref_mat.shape[1]
    nb = counts.shape[0]
    big = jnp.iinfo(jnp.int32).max
    spill = (counts[assign] > capacity) & (rank >= capacity)
    n_spill = jnp.sum(spill, dtype=jnp.int32)
    # (bucket asc, rank asc) == the host's srt_all order; padding sorts
    # last (x64 is disabled, so no composite i64 key — lexsort instead)
    order = jnp.lexsort((rank, jnp.where(spill, assign, big)))
    chunk = min(m_pad, _DP_CHUNK)
    m_rnd = -(-m_pad // chunk) * chunk
    if order.shape[0] < m_rnd:  # may exceed n on small inputs
        order = jnp.pad(order, (0, m_rnd - order.shape[0]))
    order = order[:m_rnd]
    real = (jnp.arange(m_rnd) < n_spill).reshape(-1, chunk)
    prefs = pref_mat[order].astype(jnp.int32).reshape(-1, chunk, p)
    src = assign[order].reshape(-1, chunk)
    # remaining capacity BEFORE placements: overflow buckets keep exactly
    # `capacity` members, everyone else keeps their count
    rem0 = jnp.maximum(capacity - jnp.minimum(counts, capacity), 0)

    iota = jnp.arange(chunk, dtype=jnp.int32)
    jj = jnp.arange(p, dtype=jnp.int32)

    def do_chunk(rem, inp):
        prefs_c, src_c, real_c = inp

        def body(state):
            it, cursor, into = state
            unplaced = (into < 0) & real_c
            ok_j = (jj[None, :] >= cursor[:, None]) \
                & (prefs_c != src_c[:, None])
            has = ok_j.any(axis=1) & unplaced
            j = jnp.argmax(ok_j, axis=1)
            prop = jnp.where(has, prefs_c[iota, j], -1)
            # every current claim: tentative holders keep theirs,
            # proposers claim prop; rank claimants per bucket by priority
            # (= row index): a STABLE sort by bucket keeps row order
            # within each bucket
            claim = jnp.where(has, prop, into)          # -1 = no claim
            cord = jnp.argsort(jnp.where(claim >= 0, claim, big),
                               stable=True)
            b_sorted = claim[cord]
            first = jnp.concatenate([
                jnp.ones(1, jnp.bool_), b_sorted[1:] != b_sorted[:-1]])
            seg_start = jax.lax.associative_scan(
                jnp.maximum, jnp.where(first, iota, 0))
            crank = iota - seg_start
            keep_sorted = (b_sorted >= 0) & (crank < rem[
                jnp.maximum(b_sorted, 0)])
            keep = jnp.zeros(chunk, jnp.bool_).at[cord].set(keep_sorted)
            new_into = jnp.where(keep, claim, -1)
            # proposers (accepted or not) advance past j; holders keep
            # cursor; unplaced items whose remaining prefs are all their
            # own source bucket are EXHAUSTED — cursor = p stops them
            cursor = jnp.where(has, j + 1, cursor)
            cursor = jnp.where(unplaced & ~ok_j.any(axis=1), jnp.int32(p),
                               cursor)
            return it + 1, cursor, new_into

        def cond(state):
            it, cursor, into = state
            return (it < max_rounds) & jnp.any((into < 0) & real_c
                                               & (cursor < p))

        _, _, into = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.zeros(chunk, jnp.int32),
                         jnp.full(chunk, -1, jnp.int32)))
        # finalize: this chunk's holders consume remaining capacity
        hist = jnp.zeros(nb + 1, jnp.int32).at[
            jnp.where(into >= 0, into, nb)].add(1)[:nb]
        return rem - hist, into

    _, intos = jax.lax.scan(do_chunk, rem0, (prefs, src, real))
    into = intos.reshape(-1)[:m_pad]
    bad = (into < 0) & (jnp.arange(m_pad, dtype=jnp.int32) < n_spill)
    first_bad = jnp.min(jnp.where(
        bad, jnp.arange(m_pad, dtype=jnp.int32), m_pad))
    first_bad = jnp.minimum(first_bad, n_spill)
    return into, n_spill, first_bad


class _SparsePrefs:
    """Read-only stand-in for the full (n, 8) preference matrix holding
    only the rows capacity repair can touch (items spilled from
    over-capacity buckets + members of under-min buckets). Supports the
    two access patterns :func:`_repair_from_summaries` uses — scalar row
    and fancy-indexed row block."""

    def __init__(self, n: int, items: np.ndarray, rows):
        # ``rows`` may be the materialized array or a zero-arg thunk — the
        # device path passes a thunk wrapping an async device->host copy so
        # the transfer overlaps the host-side grouping work that runs
        # before the first preference read
        self._rows = rows if isinstance(rows, np.ndarray) else None
        self._rows_thunk = None if isinstance(rows, np.ndarray) else rows
        self._idx = np.full(n, -1, np.int32)
        self._idx[items] = np.arange(len(items), dtype=np.int32)

    def __getitem__(self, i):
        if self._rows is None:
            self._rows = self._rows_thunk()
            self._rows_thunk = None
        j = self._idx[i]
        # a -1 here means the coverage argument below is violated — fail
        # loudly rather than silently reading the last row
        assert np.all(j >= 0), "preference row requested outside need-set"
        return self._rows[j]


def _repair_buckets_device(
    assign_d: jax.Array,
    own_d_d: jax.Array,
    pref_d: jax.Array | None,
    n_buckets: int,
    capacity: int,
    min_size: int,
    feats: jax.Array | None = None,
    cents: jax.Array | None = None,
    top_k: int = _TOP_PREF,
) -> list[list[int]]:
    """Capacity repair with device-side summaries — placement-identical to
    :func:`_repair_buckets` (equivalence-fuzzed) with ~5x less host-link
    traffic: instead of pulling assign + own_d + the (n, 8) preference
    matrix (~400 MB at the 10M tier over a ~20 MB/s link), pull assign
    (n*4), rank-in-bucket (n*2 when buckets hold < 64k items), and
    preference rows ONLY for the items repair can read.

    Coverage argument for the sparse preference fetch: preference lists
    are consulted for (a) items spilled from over-capacity buckets —
    exactly the rank >= capacity members of those buckets — and (b)
    members of dissolving under-min buckets. A dissolving bucket's
    members at dissolve time are its original (under-min) members plus
    items placed INTO it, and every placement source is itself (a) or
    (b), so rows for the initial spill set plus the initial under-min
    membership cover every access (the :class:`_SparsePrefs` assert
    enforces this).

    ``pref_d=None`` is the need-only mode (pass ``feats`` + ``cents``):
    no (n, top_k) preference matrix exists at all — the kmeans summarize
    pass skipped its full-n ``top_k`` (the dominant kmeans-phase HBM cost
    at the 10M tier), and this function computes preference rows on device
    for exactly the need-set via :func:`_pref_need_rows` (same semantics;
    see that docstring for the near-tie rounding caveat)."""
    if pref_d is None and (feats is None or cents is None):
        # fail fast: omitting feats/cents in need-only mode would otherwise
        # surface as an opaque jnp.take-on-None error inside the jitted
        # _pref_need_rows, and only when the need-set is non-empty
        # (data-dependently)
        raise ValueError(
            "_repair_buckets_device: need-only mode (pref_d=None) requires "
            "feats and cents")
    st = _StepTimer("repair")
    n = int(assign_d.shape[0])
    counts_d, rank_d, need_d, m_d = _repair_summaries(
        assign_d, own_d_d, n_buckets,
        np.int32(capacity), np.int32(min_size))
    counts0 = np.asarray(counts_d).astype(np.int64)
    m = int(m_d)  # scalar pull; the summaries program has already run
    log.info("repair need-set: %d of %d rows (%.1f%%)", m, n,
             100.0 * m / max(n, 1))
    st.tick("summaries+counts")
    as_u16 = n_buckets <= np.iinfo(np.uint16).max + 1

    def _m_pad_for(m):
        if m <= (1 << 20):
            # pad the gather to power-of-two classes so the compile cache
            # holds a handful of shapes, not one per spill-set size
            return max(1024, 1 << int(m - 1).bit_length())
        # above 1M rows switch to 1M-step rounding: these rows are the
        # bulk of the phase's link traffic, and pow-2 padding wastes up
        # to 2x of it (16 MB/step bound instead) for the same handful
        # of compile-cache shape classes
        return -(-m // (1 << 20)) << 20

    # issue the rank cast + the rank/assign D2H copies BEFORE enqueueing
    # the preference scan: programs run in queue order on the device, so
    # anything enqueued after the (m_pad, k) scan waits for it (measured
    # at 10M: the rank pull absorbed the whole scan when ordered after)
    rank_src = _rank_u16(rank_d) if (
        len(counts0) and counts0.max() <= np.iinfo(np.uint16).max
    ) else rank_d
    for a in (rank_src, assign_d):
        try:
            a.copy_to_host_async()
        except Exception:
            pass
    rows_d = None
    place_d = None
    if pref_d is None and m:
        # need-only: launch the preference-row compute NOW, fed by the
        # device-built index set (_need_idx twins the host flatnonzero
        # below) — the (m_pad, k) distance scan then overlaps the
        # rank/assign pulls and all the host-side grouping work, instead
        # of starting only after them. Same tile geometry as the
        # summarize pass would have used for this (n, k).
        fused, fused_interp = _use_pref_fused(n_buckets)
        if fused:
            m_pad = -(-_m_pad_for(m) // _PREF_FUSED_ROWS) * _PREF_FUSED_ROWS
            idx_d = _need_idx(need_d, m_pad)
            rows_d = _pref_need_rows_fused(
                feats, cents, idx_d, kk=min(top_k, n_buckets),
                block_c=512, as_u16=as_u16, interpret=fused_interp)
        else:
            blk = _kmeans_block(n, n_buckets, _KMEANS_BLOCK)
            m_pad = -(-max(_m_pad_for(m), blk) // blk) * blk  # tile mult
            idx_d = _need_idx(need_d, m_pad)
            rows_d = _pref_need_rows(feats, cents, idx_d,
                                     kk=min(top_k, n_buckets), block=blk,
                                     as_u16=as_u16)
        try:  # start the device->host copy as soon as the compute lands
            rows_d.copy_to_host_async()
        except Exception:
            pass
    elif pref_d is not None and m and _use_device_place():
        # summarize-fused + device placement: the whole first-fit spill
        # placement runs on device (deferred acceptance, see
        # _device_spill_place) — only the (n_spill,) placement vector
        # crosses the link instead of the (m, 8) preference rows (~8x
        # fewer bytes; on the 1-CPU host the tunnel client's transfer
        # work time-shares the core with repair's numpy work, so bytes
        # ARE wall clock here)
        m_pad = _m_pad_for(m)
        into_d, n_spill_d, first_bad_d = _device_spill_place(
            assign_d, rank_d, counts_d, pref_d, jnp.int32(capacity),
            m_pad=m_pad)
        if as_u16:
            into_d = _rank_u16(into_d)  # -1 wraps to 65535 (never a bucket)
        try:
            into_d.copy_to_host_async()
        except Exception:
            pass
        place_d = (into_d, n_spill_d, first_bad_d)
    elif pref_d is not None and m:
        # full-pref / summarize-fused mode: the matrix already exists —
        # launch the need-row gather + its device->host copy from the
        # device-built index set, before the rank/assign pulls (the host
        # flatnonzero twin is asserted below, as in need-only mode)
        m_pad = _m_pad_for(m)
        idx_d = _need_idx(need_d, m_pad)
        rows_d = _gather_pref_rows(pref_d, idx_d, as_u16)
        try:
            rows_d.copy_to_host_async()
        except Exception:
            pass
    st.tick("pref-launch")
    rank = np.asarray(rank_src)
    st.tick("rank-pull")
    assign = np.asarray(assign_d)
    st.tick("assign-pull")
    ca = counts0[assign]
    need = np.flatnonzero(
        ((ca > capacity) & (rank >= capacity)) | (ca < min_size))
    assert len(need) == m, (len(need), m)  # host/device predicate twins

    into = None
    fetch_rows = None
    if place_d is not None:
        n_spill = int(place_d[1])
        first_bad = int(place_d[2])
        # validated prefix: every placement before the first unresolved
        # item is exact (an item's outcome depends only on higher-priority
        # items); the [first_bad:] suffix — if any — replays on the host
        into = np.asarray(place_d[0]).astype(np.int64)[:first_bad]
        if first_bad < n_spill:
            log.info(
                "device placement: %d of %d spill items placed on device; "
                "host replays the tail (pref-list exhaustion)",
                first_bad, n_spill)
        st.tick("place-pull")

        def fetch_rows(items):
            # preference rows by item id: the host-replay tail and the
            # (tiny) under-min dissolve family
            mp = _m_pad_for(max(len(items), 1))
            idx = np.zeros(mp, np.int32)
            idx[:len(items)] = items
            return np.asarray(_gather_pref_rows(
                pref_d, jnp.asarray(idx), as_u16))[:len(items)]
    if m and rows_d is not None:
        rd = rows_d  # launched above, before the pulls

        def rows():
            return np.asarray(rd)[:m]

        prefs = _SparsePrefs(n, need, rows)
    elif m and into is not None:
        prefs = None  # placement/dissolve rows come lazily via fetch_rows
    else:
        cols = min(top_k, n_buckets) if pref_d is None \
            else int(pref_d.shape[1])
        prefs = _SparsePrefs(n, need, np.zeros((0, cols), np.int32))
    st.tick("pref-gather-issue")
    out = _repair_from_summaries_fast(assign, rank, counts0, prefs,
                                      n_buckets, capacity, min_size,
                                      into=into, fetch_rows=fetch_rows)
    if out is None:  # no native lib: the list-based path
        if prefs is None:  # device placement held the rows — fetch all
            prefs = _SparsePrefs(n, need, lambda: fetch_rows(need))
        out = _repair_from_summaries(assign, rank, counts0, prefs,
                                     n_buckets, capacity, min_size)
    st.tick("from-summaries")
    return out


# cluster-slab width for bf16 spill centroids: bounds the f32 accumulator
# at (slab+1, d) — a single (c_pad+1, d) f32 accumulator measured 8.6 GB at
# the 10M x 512 tier (c_pad = 2^22), the OOM next to the resident matrix
_SPILL_CENT_SLAB = 1 << 19


@partial(jax.jit, static_argnames=("c_pad",))
def _spill_centroids(feats, assign, sizes, c_pad):
    """Once per spill round: every cluster's centroid by segment-sum over
    the resident feature matrix. Unassigned rows scatter into a dump
    segment that is sliced off — masking them with an elementwise multiply
    instead materialized a full (n, d) temp (5.7 GB at 1.5M x 1000, the OOM
    next to the resident matrix).

    bf16 features: centroids are RETURNED in bf16 (candidate ranking in the
    mode's documented near-tie tolerance) and accumulated one cluster-slab
    at a time — every slab streams the full matrix, but that is ~0.1 s/pass
    of bandwidth vs an (c_pad+1, d) f32 accumulator that cannot fit.

    int8 features: centroids ROUND BACK TO THE GRID and return int8 —
    <= 0.5/dim rounding against coordinates spanning [-127, 127], the same
    tolerance class as bf16's centroid rounding, and the (c_pad, d) matrix
    is 4.6 GB -> 2.3 GB at the 10M x 1024 tier, next to a 10.2 GB resident
    matrix."""
    out_dt = jnp.int8 if feats.dtype == jnp.int8 else jnp.bfloat16
    seg = jnp.where(assign >= 0, assign, c_pad)
    if feats.dtype != jnp.float32:  # bf16 or int8 residency
        n, d = feats.shape
        block = min(1 << 16, 1 << max(n - 1, 1).bit_length())
        n_main = (n // block) * block
        n_blocks = n_main // block
        # slab width bounded by d too: the (C+1, d) f32 accumulator stays
        # ~1 GB at any width (at d=1024 the fixed 2^19 slab would be
        # 2.15 GB next to the resident matrix); d <= 512 keeps today's
        # exact slab boundaries
        C = min(c_pad, _SPILL_CENT_SLAB, max(1 << 14, (1 << 28) // d))
        n_slabs = -(-c_pad // C)

        def slab_sums(base):
            # segment-sum restricted to clusters [base, base+C): everything
            # else lands in the dump row C
            local = seg - base
            local = jnp.where((local >= 0) & (local < C), local, C)

            def blk(sums, i):
                rows = jax.lax.dynamic_slice_in_dim(
                    feats, i * block, block, 0).astype(jnp.float32)
                sg = jax.lax.dynamic_slice_in_dim(local, i * block, block, 0)
                return sums + jax.ops.segment_sum(
                    rows, sg, num_segments=C + 1), None

            sums = jnp.zeros((C + 1, d), jnp.float32)
            if n_blocks:
                sums, _ = jax.lax.scan(
                    blk, sums, jnp.arange(n_blocks, dtype=jnp.int32))
            if n - n_main:
                tail = feats[n_main:].astype(jnp.float32)
                sums = sums + jax.ops.segment_sum(
                    tail, local[n_main:], num_segments=C + 1)
            return sums[:C]

        def slab(out, j):
            # clamped start: a partial final slab recomputes the overlap
            # (identical values written twice) so every slab shape is equal
            base = jnp.minimum(j * C, c_pad - C)
            sz = jax.lax.dynamic_slice_in_dim(sizes, base, C, 0)
            mean = slab_sums(base) / jnp.maximum(
                sz, 1)[:, None].astype(jnp.float32)
            if out_dt == jnp.int8:  # back onto the feature grid
                mean = jnp.clip(jnp.round(mean), -127, 127)
            return jax.lax.dynamic_update_slice(
                out, mean.astype(out_dt), (base, 0)), None

        out = jnp.zeros((c_pad, d), out_dt)
        out, _ = jax.lax.scan(
            slab, out, jnp.arange(n_slabs, dtype=jnp.int32))
        return out
    sums = jax.ops.segment_sum(feats, seg, num_segments=c_pad + 1)[:c_pad]
    return sums / jnp.maximum(sizes, 1)[:, None].astype(feats.dtype)


@partial(jax.jit, static_argnames=("k",))
def _spill_candidates_local(feats, cents, sizes, drop_idx, item_bucket,
                            bucket_clusters, k, max_size, cent_norms=None):
    """Bucket-LOCAL candidate search: gather only each item's own bucket's
    cluster centroids — (chunk, mc, d) with mc = max clusters per bucket
    (~bucket_size/min_size) — instead of scoring all c_pad clusters and
    masking the ~40 relevant columns (at the 10M x 512 tier that full tile
    plus its top_k temps exhausted the chip). Returns GLOBAL cluster ids,
    -1 where invalid.

    ``cent_norms`` (precomputed (c_pad,) f32 squared norms) replaces the
    per-chunk (chunk, mc, d) f32 square-and-reduce — bit-identical
    (square-then-gather == gather-then-square elementwise) and drops the
    largest f32 temp of the pass."""
    dx = feats[drop_idx]                       # (chunk, d), native dtype
    cl = bucket_clusters[item_bucket]          # (chunk, mc), -1 padded
    safe = jnp.maximum(cl, 0)
    cc = cents[safe]                           # (chunk, mc, d)
    xx = jnp.sum(jnp.square(dx.astype(jnp.float32)), -1)[:, None]
    if cent_norms is None:
        yy = jnp.sum(jnp.square(cc.astype(jnp.float32)), -1)
    else:
        yy = cent_norms[safe]                  # (chunk, mc)
    if dx.dtype == jnp.int8 and cc.dtype == jnp.int8:
        # grid features x grid centroids: exact int8 MXU gram
        g = jnp.einsum("cd,cmd->cm", dx, cc,
                       preferred_element_type=jnp.int32).astype(jnp.float32)
    else:
        if dx.dtype == jnp.int8:
            dx = dx.astype(jnp.bfloat16)  # exact upcast
        if cc.dtype == jnp.int8:
            cc = cc.astype(jnp.bfloat16)
        g = jnp.einsum("cd,cmd->cm", dx, cc,
                       preferred_element_type=jnp.float32)
    d2 = xx + yy - 2.0 * g
    valid = (cl >= 0) & (sizes[safe] < max_size)
    d2 = jnp.where(valid, d2, jnp.inf)
    kk = min(k, cl.shape[1])
    vals, pos = jax.lax.top_k(-d2, kk)
    cand = jnp.take_along_axis(cl, pos, axis=1)
    return jnp.where(jnp.isfinite(vals), cand, -1)


@jax.jit
def _cent_norms(cents):
    """(c_pad,) f32 squared norms of the spill centroids, computed once per
    spill round instead of per candidate chunk."""
    return jnp.sum(jnp.square(cents.astype(jnp.float32)), axis=1)


# member-table bound: (c_pad+1) * max_size * 4 bytes of device i32. Past it
# (huge max_size) the table path falls back to the slab segment-sum.
_SPILL_TABLE_BYTES = 1 << 28

# f32 gather temp per slab of the table centroid pass (~0.5 GB)
_SPILL_TABLE_SLAB_ELEMS = 1 << 27


@partial(jax.jit, static_argnames=("c_pad", "ms"))
def _spill_member_table(assign, c_pad, ms):
    """(c_pad, ms) member table + per-cluster counts, built on device from
    the assignment vector: row c lists cluster c's members ascending by
    item id (stable sort), padded with n (the sentinel "no member").

    Cluster sizes never exceed ``ms`` (= max_size) during the spill phases
    — placements are bounded by room — but anything past ms (and every
    unassigned item) defensively lands in a dump row that is sliced off.
    The table is what lets every spill round rebuild all centroids with ONE
    gather+fixed-width-reduce stream over the feature matrix instead of
    the slab path's ~n_slabs full-matrix segment-sum scans (8 passes at
    the 10M x 512 tier)."""
    n = assign.shape[0]
    a = jnp.where(assign >= 0, assign, c_pad)
    perm = jnp.argsort(a, stable=True).astype(jnp.int32)
    sorted_a = a[perm]
    # scatter-free: segment starts by binary search over the sorted keys,
    # then the table is a pure gather (an n-element scatter-set measured
    # seconds at the 10M tier; this is ~c_pad*ms gathers)
    offs = jnp.searchsorted(
        sorted_a, jnp.arange(c_pad + 1, dtype=jnp.int32)).astype(jnp.int32)
    counts = jnp.diff(
        jnp.concatenate([offs, jnp.full(1, n, jnp.int32)])).astype(jnp.int32)
    slots = jnp.arange(ms, dtype=jnp.int32)[None, :]
    pos = jnp.minimum(offs[:c_pad, None] + slots, n - 1)
    ok = slots < counts[:c_pad, None]
    table = jnp.where(ok, perm[pos], n)
    return table, counts[:c_pad]


@partial(jax.jit, donate_argnums=(0, 1))
def _spill_table_append(table, counts, rows, slots, items):
    """Scatter one round's placements into the member table (slot = the
    cluster's size at append time, so appended members keep Go append
    order after the sorted base block). Padding entries carry row = c_pad
    (out of range) and are dropped."""
    table = table.at[rows, slots].set(items, mode="drop")
    counts = counts.at[rows].add(jnp.where(rows < counts.shape[0], 1, 0),
                                 mode="drop")
    return table, counts


@jax.jit
def _sizes_from_counts(counts, n_c, max_size):
    """Device sizes vector for the candidate masks: real clusters get their
    live counts, padding rows read "full" (same convention as the host
    snapshot)."""
    c_pad = counts.shape[0]
    return jnp.where(jnp.arange(c_pad, dtype=jnp.int32) < n_c,
                     counts, max_size)


@partial(jax.jit, static_argnames=("c_pad",))
def _spill_cent_table(feats, table, counts, c_pad):
    """All spill-round centroids (+ their squared norms) from the member
    table: gather each cluster's <= ms rows, mask the sentinel, reduce in
    f32, divide, cast — one pass over ~n*ms/mean_size rows of the feature
    matrix, no scatter. Per-cluster accumulation order is the table's
    member order (sorted base block, then appends), a different-but-
    equivalent rounding path to the slab segment-sum's global stream order
    — inside the residency modes' documented near-tie envelope, and exact
    wherever sums are exactly representable (the int8 grid always;
    integer-valued bf16 data). Norms are computed from the CAST centroids,
    matching :func:`_cent_norms` on the returned matrix bit for bit."""
    n, d = feats.shape
    ms = table.shape[1]
    out_dt = jnp.int8 if feats.dtype == jnp.int8 else jnp.bfloat16
    C = max(1, min(c_pad, _SPILL_TABLE_SLAB_ELEMS // max(1, ms * d)))
    n_slabs = -(-c_pad // C)

    def slab(carry, j):
        out, norms = carry
        # clamped start: a partial final slab recomputes the overlap
        # (identical values written twice) so every slab shape is equal
        base = jnp.minimum(j * C, c_pad - C)
        tb = jax.lax.dynamic_slice_in_dim(table, base, C, 0)
        safe = jnp.minimum(tb, n - 1)
        rows = feats[safe].astype(jnp.float32)          # (C, ms, d)
        mask = (tb < n).astype(jnp.float32)[..., None]
        sums = jnp.sum(rows * mask, axis=1)             # (C, d) f32
        cnt = jax.lax.dynamic_slice_in_dim(counts, base, C, 0)
        mean = sums / jnp.maximum(cnt, 1)[:, None].astype(jnp.float32)
        if out_dt == jnp.int8:  # back onto the feature grid
            mean = jnp.clip(jnp.round(mean), -127, 127)
        cm = mean.astype(out_dt)
        nr = jnp.sum(jnp.square(cm.astype(jnp.float32)), axis=1)
        out = jax.lax.dynamic_update_slice(out, cm, (base, 0))
        norms = jax.lax.dynamic_update_slice(norms, nr, (base,))
        return (out, norms), None

    out = jnp.zeros((c_pad, d), out_dt)
    norms = jnp.zeros((c_pad,), jnp.float32)
    (out, norms), _ = jax.lax.scan(
        slab, (out, norms), jnp.arange(n_slabs, dtype=jnp.int32))
    return out, norms


@partial(jax.jit, static_argnames=("k",))
def _spill_candidates(feats, cents, sizes, drop_idx, k, max_size,
                      cent_norms=None):
    """Per chunk of leftover items: top-k nearest clusters (over ALL
    clusters) that still have room — the GLOBAL pass. Only (chunk, k)
    indices cross to the host; the bucket-local pass uses
    :func:`_spill_candidates_local` instead. ``cent_norms`` hoists the
    per-chunk norm reduction over the full (c_pad, d) matrix to once per
    round (bit-identical; at the 10M tier each chunk otherwise re-reads
    ~2 GB of centroids just for norms)."""
    dx = feats[drop_idx]
    # _sqdist_tile: bf16 features run the native-bf16 gram against the
    # (now bf16) centroid matrix — no f32 copy of (c_pad, d) materializes
    d2 = _sqdist_tile(dx, cents, cent_norms)  # (chunk, c_pad)
    d2 = jnp.where(sizes[None, :] < max_size, d2, jnp.inf)
    vals, cand = jax.lax.top_k(-d2, k)
    # inf-masked entries still get top_k positions — mark them invalid so
    # the placement loop can't place an item into a masked-out cluster
    # (in the bucket-local pass EVERY other-bucket cluster is masked)
    return jnp.where(jnp.isfinite(vals), cand, -1)


def _ranges(sizes: np.ndarray) -> np.ndarray:
    """[0..s0), [0..s1), ... concatenated (vectorized per-segment arange)."""
    total = int(sizes.sum())
    if total == 0:
        return np.zeros(0, np.int64)
    starts = np.concatenate([[0], np.cumsum(sizes[:-1])])
    return np.arange(total, dtype=np.int64) - np.repeat(starts, sizes)


class _Clusters:
    """Columnar cluster membership (compact ids 0..num-1) with O(1)
    appends — the spill phases' working view AND the result's storage.

    Replaces the dict-of-lists the engine used to carry through its tail:
    at the 10M tier, just constructing that dict (2.17M python lists)
    measured ~85 s of host time; here membership is two numpy arrays and
    the rare spill placements land in a small append overlay."""

    def __init__(self, members, offsets, bucket=None):
        self.members = np.asarray(members, dtype=np.int64)
        self.offsets = np.asarray(offsets, dtype=np.int64)
        self.base_sizes = np.diff(self.offsets).astype(np.int32)
        self.bucket = None if bucket is None else np.asarray(
            bucket, dtype=np.int32)
        self.extra: dict[int, list[int]] = {}
        self._extra_count = np.zeros(len(self.base_sizes), np.int32)

    @classmethod
    def from_lists(cls, clusters: list[list[int]], bucket=None):
        sizes = np.array([len(c) for c in clusters], np.int64)
        offsets = np.concatenate([[0], np.cumsum(sizes)])
        members = np.concatenate(
            [np.asarray(c, np.int64) for c in clusters]
        ) if clusters else np.zeros(0, np.int64)
        return cls(members, offsets, bucket)

    @property
    def num(self) -> int:
        return len(self.base_sizes)

    def sizes(self) -> np.ndarray:
        return self.base_sizes + self._extra_count

    def append(self, c: int, item: int) -> None:
        self.extra.setdefault(c, []).append(item)
        self._extra_count[c] += 1

    def assign_array(self, n: int) -> np.ndarray:
        """(n,) item -> cluster id, -1 for unplaced. One vectorized
        scatter (the dict version looped clusters in python per round)."""
        out = np.full(n, -1, np.int32)
        out[self.members] = np.repeat(
            np.arange(self.num, dtype=np.int32), self.base_sizes)
        for c, items in self.extra.items():
            out[items] = c
        return out

    def finalize(self) -> tuple[np.ndarray, np.ndarray]:
        """(members, offsets) with appends merged after each cluster's base
        segment (spill placements keep Go append order)."""
        if not self.extra:
            return self.members, self.offsets
        sizes_new = self.sizes().astype(np.int64)
        off_new = np.concatenate([[0], np.cumsum(sizes_new)])
        out = np.empty(int(off_new[-1]), np.int64)
        base_pos = np.repeat(off_new[:-1], self.base_sizes) \
            + _ranges(self.base_sizes)
        out[base_pos] = self.members
        for c, items in self.extra.items():
            s = int(off_new[c]) + int(self.base_sizes[c])
            out[s:s + len(items)] = items
        return out, off_new


def _spill_rounds(
    feats: jax.Array,
    cols: _Clusters,
    dropped_idx: list[int],
    max_size: int,
    item_bucket_of: dict[int, int] | None = None,
) -> list[int]:
    """Greedy nearest-cluster-with-room placement, candidate search fully on
    device — only (m, k) candidate indices ever cross to the host (the old
    bucket-local pass pulled feature ROWS per affected bucket: measured 23 s
    of pure tunnel transfer at 1M x 1000).

    Each round asks the device for every leftover item's top-k nearest
    clusters WITH ROOM and places greedily; when many leftovers contend for
    the same few candidates the round's room snapshot goes stale, so iterate
    — the next round re-snapshots sizes and searches again. Terminates when
    a round places nothing (either nothing has room or nothing is left).
    With ``cols.bucket``/``item_bucket_of``, placements are restricted to
    each item's own bucket (locality-preserving first pass). ``cols`` is
    mutated in place (appends); returns the still-unplaced items."""
    still = list(dropped_idx)
    # every productive round places >= 1 item, so rounds are bounded by the
    # dropped count; a fixed small cap here would silently re-drop
    # still-placeable items under heavy candidate contention, violating the
    # engine's no-image-loss default. To keep contention from degrading to
    # O(dropped) full-matrix passes, k DOUBLES whenever a round places less
    # than half its leftovers (stale-room misses shrink geometrically as
    # each item sees more candidates), so low-progress rounds are bounded
    # by ~log2(K_CAP/8) before k saturates.
    K_CAP = 4096
    k = 0  # set on the first round from the live cluster count
    n_c = cols.num
    stt = _StepTimer("spill-local" if item_bucket_of is not None
                     else "spill-global")
    local = cols.bucket is not None and item_bucket_of is not None
    table_d = None
    if local and n_c and still:
        # own-bucket candidate table, built ONCE for all rounds (cluster ->
        # bucket is static during spill; only sizes/centroids change):
        # row b lists bucket b's cluster ids, -1 padded to mc = max
        # clusters per bucket. Covers every ITEM's bucket too: a bucket
        # whose clusters all dropped has an all -1 row (no local
        # candidates -> the later global pass).
        bk = cols.bucket
        nb_max = 1 + max(
            int(bk.max()) if len(bk) else 0,
            max(item_bucket_of[i] for i in still),
        )
        order_b = np.argsort(bk, kind="stable")
        counts_b = np.bincount(bk, minlength=nb_max)
        mc = max(1, int(counts_b.max()))
        table = np.full((nb_max, mc), -1, np.int32)
        table[bk[order_b], _ranges(counts_b)] = order_b
        table_d = jnp.asarray(table)
    n = feats.shape[0]
    # static shapes: power-of-two padding below ~0.5M clusters (compile
    # cache classes); above it, pad to a 64k multiple instead — po2
    # nearly DOUBLES the centroid matrix at the 10M tier (2.17M live
    # clusters -> 2^22 rows), which is the difference between the spill
    # phase fitting next to the resident bf16 matrix and OOMing
    if n_c > _SPILL_CENT_SLAB:
        c_pad = -(-n_c // (1 << 16)) * (1 << 16)
    else:
        c_pad = 1 << max(n_c - 1, 1).bit_length()
    # member-table centroid path (non-f32 residency, table fits): per round,
    # centroids rebuild with one gather+reduce stream over the feature
    # matrix instead of n_slabs full-matrix segment-sum scans, the
    # assignment vector crosses the link once per PHASE (placement deltas
    # scatter on device), and sizes never cross at all
    use_table = (
        feats.dtype != jnp.float32
        and (c_pad + 1) * max(max_size, 1) * 4 <= _SPILL_TABLE_BYTES
        and os.environ.get("IMAGECLUST_SPILL_TABLE", "1") != "0"
    )
    mt_d = mcounts_d = None
    for _ in range(len(still) + 1):
        if n_c == 0 or not still:
            break
        sizes = np.full(c_pad, max_size, np.int32)  # padding reads "full"
        sizes[:n_c] = cols.sizes()
        if not (sizes[:n_c] < max_size).any():
            break  # genuinely full everywhere
        stt.tick("round-sizes")
        k = min(max(k, 8), n_c, K_CAP)
        # drop the previous round's centroid matrix BEFORE building the new
        # one — rebinding after the call would briefly hold two (c_pad, d)
        # generations (2 x 2.3 GB at the 10M x 512 tier)
        cents_d = cent_norms_d = None  # noqa: F841 — frees device buffers
        if use_table:
            if mt_d is None:
                cache = getattr(cols, "_spill_dev", None)
                appends = int(cols._extra_count.sum())
                if (cache is not None and cache[0] == (c_pad, max_size)
                        and cache[3] == appends):
                    mt_d, mcounts_d = cache[1], cache[2]
                else:  # one assignment transfer per phase, not per round
                    assign = cols.assign_array(n)
                    stt.tick("assign-array")
                    mt_d, mcounts_d = _spill_member_table(
                        jnp.asarray(assign), c_pad, max_size)
                cols._spill_dev = (
                    (c_pad, max_size), mt_d, mcounts_d, appends)
            sizes_d = _sizes_from_counts(
                mcounts_d, jnp.int32(n_c), jnp.int32(max_size))
            cents_d, cent_norms_d = _spill_cent_table(
                feats, mt_d, mcounts_d, c_pad)
        else:
            assign = cols.assign_array(n)
            stt.tick("assign-array")
            sizes_d = jnp.asarray(sizes)
            cents_d = _spill_centroids(
                feats, jnp.asarray(assign), sizes_d, c_pad)
            cent_norms_d = _cent_norms(cents_d)
        stt.tick("centroids-issue")
        ms = jnp.int32(max_size)
        if local:
            # own-bucket pass: candidates come from the precomputed
            # (nb, mc) cluster table instead of a c_pad-wide tile — the
            # candidate SET is identical (same-bucket clusters with room),
            # the cost is (chunk, mc, d) with mc ~ bucket_size/min_size.
            # Budget that gather at a 128 MB nominal f32 tile, same scheme
            # as the global pass: a fixed 1024-wide chunk at the
            # 10M x 1024 tier gathered ~0.5 GB per dispatch next to a
            # ~12.5 GB resident set — RESOURCE_EXHAUSTED, caught by the
            # round-3 measurement ladder at both 10M big-d tiers
            budget = (1 << 27) // max(1, 4 * mc * feats.shape[1])
            CHUNK = 1 << max(3, min(10, budget.bit_length() - 1))
        else:
            # global pass: the padded width bounds the (chunk, c_pad)
            # distance tile — the nominal tile is budgeted at 256 MB
            # because top_k over millions of columns materializes ~4x that
            # in sort/index temps (measured: a 1 GB nominal tile at
            # c_pad=2.23M exhausted the chip). Power-of-two width keeps
            # one compiled shape per (c_pad, width) class.
            budget = (1 << 28) // max(1, 4 * c_pad)
            CHUNK = 1 << max(5, min(12, budget.bit_length() - 1))
        cand_parts = []
        for s in range(0, len(still), CHUNK):
            part = still[s:s + CHUNK]
            width = CHUNK if len(still) > CHUNK else (
                1 << max(len(part) - 1, 0).bit_length())
            idxs = np.zeros(width, np.int32)
            idxs[: len(part)] = part
            if local:
                ib = np.zeros(width, np.int32)
                ib[: len(part)] = [item_bucket_of[i] for i in part]
                ib[len(part):] = 0  # padded rows are sliced off below
                out = np.asarray(_spill_candidates_local(
                    feats, cents_d, sizes_d, jnp.asarray(idxs),
                    jnp.asarray(ib), table_d, k, ms, cent_norms_d,
                ))
            else:
                out = np.asarray(_spill_candidates(
                    feats, cents_d, sizes_d, jnp.asarray(idxs),
                    k, ms, cent_norms_d,
                ))
            cand_parts.append(out[: len(part)])
        cand = np.concatenate(cand_parts) if cand_parts else np.zeros(
            (0, k), np.int32)
        stt.tick(f"candidates(m={len(still)},k={k})")
        room = (max_size - sizes[:n_c]).astype(np.int64)
        next_still: list[int] = []
        pl_rows: list[int] = []
        pl_slots: list[int] = []
        pl_items: list[int] = []
        for row, item in enumerate(still):
            for p in cand[row]:
                p = int(p)
                if 0 <= p < n_c and room[p] > 0:
                    cols.append(p, item)
                    room[p] -= 1
                    if use_table:
                        pl_rows.append(p)
                        pl_slots.append(int(sizes[p]))
                        sizes[p] += 1  # next slot; room bounds it < max
                        pl_items.append(item)
                    break
            else:
                next_still.append(item)
        placed = len(still) - len(next_still)
        if use_table and placed:
            # pad the delta scatter to power-of-two classes (row c_pad is
            # out of table range -> dropped) so compile shapes stay few
            w = 1 << max(placed - 1, 0).bit_length()
            dr = np.full(w, c_pad, np.int32)
            ds = np.zeros(w, np.int32)
            di = np.full(w, n, np.int32)
            dr[:placed] = pl_rows
            ds[:placed] = pl_slots
            di[:placed] = pl_items
            mt_d, mcounts_d = _spill_table_append(
                mt_d, mcounts_d, jnp.asarray(dr), jnp.asarray(ds),
                jnp.asarray(di))
            cols._spill_dev = ((c_pad, max_size), mt_d, mcounts_d,
                               int(cols._extra_count.sum()))
        stt.tick(f"host-place(placed={placed})")
        if placed == 0:
            break  # no progress: every leftover's candidates are full
        if placed * 2 < len(still):  # contention: widen the search
            k = min(2 * k, n_c, K_CAP)
        still = next_still
    return still


def _spill_bucket_local(
    feats: jax.Array,
    buckets: list[list[int]],
    cols: _Clusters,
    dropped_idx: list[int],
    max_size: int,
) -> list[int]:
    """Item-level rescue for what the absorb phase couldn't place: an
    under-min cluster whose WHOLE merge would break max_size everywhere can
    still spill its members one by one into same-bucket clusters with room
    (``cols.bucket`` carries each cluster's bucket). Device-side candidate
    search restricted to each item's own bucket."""
    # item -> bucket only for the DROPPED items: a dict comprehension over
    # every bucket member was ~O(n) python at the 10M tier for a set that
    # is usually orders of magnitude smaller
    owner = np.empty(feats.shape[0], np.int32)
    for bi, members in enumerate(buckets):
        owner[members] = bi
    bucket_of = {int(i): int(owner[i]) for i in dropped_idx}
    return _spill_rounds(feats, cols, dropped_idx, max_size,
                         item_bucket_of=bucket_of)


def _spill_global(
    feats: jax.Array,
    cols: _Clusters,
    dropped_idx: list[int],
    max_size: int,
) -> list[int]:
    """Cross-bucket fallback for items whose own bucket is completely full:
    place each into its nearest cluster with room anywhere in the job."""
    return _spill_rounds(feats, cols, dropped_idx, max_size)


def _native_reconstruction(buckets, logs, steps, births, active):
    """Flatten per-bucket state for the native member-expansion pass
    (data/native.py ic_reconstruct_members). Returns (global member indices
    concatenated in (bucket, sorted-root) order, per-root sizes, per-root
    bucket id) — exactly the python walk's iteration order — or None when
    the native lib is absent."""
    from imageclust_tpu.data.native import native_reconstruct_members

    nb = len(buckets)
    counts = np.asarray([len(b) for b in buckets], np.int32)
    if not counts.sum():
        return None
    B1 = logs.shape[1]
    m_per = np.minimum(steps.astype(np.int64), B1)
    row_mask = np.arange(B1)[None, :] < m_per[:, None]
    flat_logs = logs[row_mask]  # (sum_m, 3), bucket order
    log_off = np.zeros(nb + 1, np.int64)
    log_off[1:] = np.cumsum(m_per)
    counts_off = np.zeros(nb + 1, np.int64)
    counts_off[1:] = np.cumsum(counts)
    # surviving roots per bucket, ascending (actives sort before the
    # sentinel) — same order the python walk visits
    sentinel = np.int32(2**31 - 1)
    masked = np.sort(np.where(active, births, sentinel), axis=1)
    n_roots = active.sum(axis=1).astype(np.int64)
    roots_flat = masked[np.arange(masked.shape[1])[None, :]
                        < n_roots[:, None]].astype(np.int32)
    root_off = np.zeros(nb + 1, np.int64)
    root_off[1:] = np.cumsum(n_roots)

    out = native_reconstruct_members(
        flat_logs, log_off, counts, counts_off, roots_flat, root_off)
    if out is None:
        return None
    members_loc, sizes = out
    # bucket-local member index -> global item id: members_flat is each
    # bucket's global ids laid out in the same per-bucket regions as the
    # native output, so adding the per-entry bucket base aligns them
    members_flat = np.concatenate(
        [np.asarray(b, np.int64) for b in buckets if len(b)])
    bases = np.repeat(counts_off[:-1], counts)
    members_glob = members_flat[members_loc.astype(np.int64) + bases]
    return members_glob, sizes, np.repeat(np.arange(nb), n_roots)


def _restamp_logs(logs: np.ndarray, steps: np.ndarray, counts: np.ndarray,
                  bucket_idx: np.ndarray, n: int) -> np.ndarray:
    """Re-stamp the bucket-LOCAL merge logs into one global birth space so
    ClusterResult.merges is a valid dendrogram like the exact and chain
    engines': leaf stamps (< count) become global item indices via the
    bucket membership matrix; internal stamps (the loop assigns
    new = count + row) become fresh ids past n, offset by each bucket's
    cumulative base. Vectorized over ALL buckets at once, compact-FIRST
    (valid prefixes selected before any mapping) and all-int32: mapping on
    the padded (nb, L, 2) int64 tensor cost ~8-25 host seconds at the 10M
    tier on this box; this form measures ~1.2 s bit-identically. Stamps
    top out at n + total_merges (< 2n + 1), well inside int32 for the
    int32-indexed engine."""
    nb, bucket_size = bucket_idx.shape
    steps = steps.astype(np.int32)
    total_merges = int(steps.sum(dtype=np.int64))
    if not total_merges:
        return np.zeros((0, 3), np.int32)
    L = logs.shape[1]
    base = np.empty(nb, np.int32)  # per-bucket stamp base
    base[0] = n
    np.cumsum(steps[:-1], out=base[1:])
    base[1:] += n
    row_valid = np.arange(L, dtype=np.int32)[None, :] < steps[:, None]
    flat = logs[:, :, :2][row_valid]  # (total, 2) local stamps
    rows = np.repeat(np.arange(nb, dtype=np.int32), steps)  # (total,)
    c_r = counts.astype(np.int32)[rows][:, None]
    leaf = flat < c_r
    gathered = bucket_idx[rows[:, None], np.where(leaf, flat, 0)]
    mapped = np.where(leaf, gathered, base[rows][:, None] + (flat - c_r))
    pos = np.arange(L, dtype=np.int32)[None, :].repeat(nb, 0)[row_valid]
    out = np.empty((total_merges, 3), np.int32)
    out[:, :2] = mapped
    out[:, 2] = base[rows] + pos
    return out


def _bucket_target(count: int, min_size: int, max_size: int) -> int:
    """Per-bucket cluster-count target. Falls back to ceil(count/max_size)
    when the (min,max) pair is infeasible for this count — scalable-mode
    deviation; the exact engine raises instead (clustering.go:168-186)."""
    try:
        return calculate_optimal_clusters(count, min_size, max_size)
    except Exception:
        return max(1, math.ceil(count / max_size))


def constrained_ward_bucketed(
    embeddings,
    ids: Sequence[str] | None = None,
    *,
    min_size: int = 3,
    max_size: int = 6,
    bucket_size: int = 512,
    kmeans_iters: int = 8,
    update_rule: str = "lance_williams",
    mesh: Mesh | None = None,
    seed: int = 0,
    reassign_dropped: bool = True,
    feature_dtype: str = "float32",
) -> ClusterResult:
    """Scalable constrained Ward over k-means buckets.

    ``embeddings`` may be a numpy array or a device-resident jax array (the
    fast path: features coming straight from the embedder never leave HBM).
    With ``mesh`` given, the bucket axis is sharded over the mesh's 'data'
    axis so buckets cluster in parallel on every chip.

    ``reassign_dropped`` defaults to True HERE (unlike the exact engine,
    which preserves the reference's silent drop as parity): this engine is
    already a documented approximation of the global merge order, and round-1
    measurement showed the parity drop discarding ~8% of a 100k job. It is
    implemented as an on-device absorb phase inside the bucket loop — items
    that still cannot be placed without breaking max_size remain dropped.

    ``feature_dtype="bfloat16"`` keeps the RESIDENT feature matrix in bf16
    (half the HBM: the 16 GB single-chip envelope moves from ~1e9 to ~2e9
    feature floats — 1.5M x 1000 fits). All arithmetic still accumulates
    in f32 (tile-level casts fused into the MXU ops); only the one-time
    rounding of inputs to bf16 differs. Like int8 serving, this is a
    precision-caveated NON-parity mode: distances shift within bf16
    rounding, so assignments can differ near ties.

    ``feature_dtype="int8"`` halves residency AGAIN (~4e9 feature elements
    per chip — 10M x 1024, the full CLIP joint visual+text width): inputs
    are quantized ONCE to a symmetric per-tensor int8 grid
    (scale = absmax/127) and the engine clusters the raw grid values —
    Ward's merge order is invariant to a global scale, so no scale
    threads through the math, and int8 -> bf16/f32 tile casts are exact.
    The precision caveat is the quantization itself (features round to 8
    bits, like ``embed.quantize=int8``); pass an int8 array to skip the
    internal quantization (values are used as-is).
    """
    if feature_dtype not in ("float32", "bfloat16", "int8"):
        raise ValueError(f"unknown feature_dtype {feature_dtype!r}")
    pt = _PhaseTimer()
    dt = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
          "int8": jnp.int8}[feature_dtype]
    if not isinstance(embeddings, jax.Array):
        arr = np.asarray(embeddings)
        if arr.dtype != np.int8:
            arr = np.asarray(arr, np.float32)
        embeddings = jnp.asarray(arr)
    if dt == jnp.int8 and embeddings.dtype != jnp.int8:
        feats = _feat_int8(embeddings)
        pt.tick("quantize", sync=feats[:1, :1])
    else:
        feats = embeddings.astype(dt)
    n, d = feats.shape
    if ids is None:
        from imageclust_tpu.cluster.ward import DefaultIds

        ids = DefaultIds(n)  # lazy: never materialized at the 10M tier
    if len(ids) != n:  # fail fast like the sibling engines
        raise ValueError("ids length must match embeddings")
    calculate_optimal_clusters(n, min_size, max_size)  # global feasibility

    fill = max(min_size, int(bucket_size * 0.75))
    n_buckets = max(1, math.ceil(n / fill))
    # (mesh alignment happens AFTER repair by padding empty buckets — never
    # inflate k past what the data supports)
    if n_buckets == 1:
        from imageclust_tpu.cluster.ward import constrained_ward

        return constrained_ward(
            np.asarray(feats, dtype=np.float32),  # int8 grid values: exact
            list(ids),  # the exact engine wants a real list (tiny here)
            min_size=min_size, max_size=max_size,
            update_rule=update_rule, reassign_dropped=reassign_dropped,
            mesh=mesh,
        )

    # need-only preferences: the summarize pass skips its full-n top_k —
    # ~top_k extra HBM passes over the n*k*4-byte distance stream — and
    # repair computes preference rows on device for just the items it can
    # legally read (74% of rows at the 10M tier's measured Lloyd
    # distribution — large, but the re-scan overlaps repair's host work
    # where the in-summarize top_k is serial device time).
    # Worth it only when that stream dominates the kmeans phase: measured
    # at 10M x 512 (n*k ~ 5e11) the full top_k costs ~15-20 s, while at
    # 2M x 512 (n*k ~ 2e10) the need pass's own padded re-scan costs MORE
    # than it saves, so the default flips on n*k. IMAGECLUST_PREF_NEED_ONLY
    # (1/0) overrides either way. Preference VALUES are computed from the
    # same centroids with the same tile geometry either way; near-tie f32
    # rounding may still differ between the two compiled programs, which
    # in this already-approximate mode can shift a handful of placements.
    # Summarize-fused preferences supersede both modes on TPU at large k:
    # the fused kernel computes assignment + own distance + top-8 prefs in
    # the SAME gram pass, so neither the in-summarize k-lane top_k nor the
    # repair-time need-row re-scan runs at all.
    sum_fused, sum_interp = _use_summarize_fused(n_buckets)
    if sum_fused:
        cents_d, assign_d, own_d_d, pref_d = kmeans(
            feats, n_buckets, kmeans_iters, seed, top_k=_TOP_PREF,
            summarize_fused=True, fused_interpret=sum_interp)
    else:
        env = os.environ.get("IMAGECLUST_PREF_NEED_ONLY")
        if env is not None:
            need_only = env != "0"
        else:
            need_only = n * n_buckets >= _PREF_NEED_ONLY_MIN_WORK
        cents_d, assign_d, own_d_d, pref_d = kmeans(
            feats, n_buckets, kmeans_iters, seed,
            top_k=0 if need_only else _TOP_PREF)
    pt.tick("kmeans", sync=own_d_d)
    buckets = _repair_buckets_device(
        assign_d, own_d_d, pref_d, n_buckets, bucket_size, min_size,
        feats=feats, cents=cents_d)
    # the kmeans byproducts stay on device (only their summaries crossed
    # the link); drop them — (n,) + (n,) + the (k, d) centroids (plus the
    # (n, 8) matrix when need-only is off) sit in exactly the HBM margin
    # the spill phase later runs in
    del assign_d, own_d_d, pref_d, cents_d
    pt.tick("bucket-repair")

    nb = len(buckets)
    if mesh is not None:
        n_dev = mesh.shape["data"]
        while nb % n_dev != 0:  # pad with empty buckets for even sharding
            buckets.append([])
            nb += 1

    counts = np.zeros(nb, np.int32)
    targets = np.zeros(nb, np.int32)
    bucket_idx = np.zeros((nb, bucket_size), np.int32)
    for bi, members in enumerate(buckets):
        c = len(members)
        counts[bi] = c
        targets[bi] = _bucket_target(c, min_size, max_size) if c else 0
        bucket_idx[bi, :c] = members

    if mesh is not None:
        # owner-aligned path: features row-sharded, one all_to_all moves
        # every bucket member to its bucket's device — nothing replicates
        ndev = mesh.shape["data"]
        n_rows_pad = int(math.ceil(n / ndev)) * ndev
        if n_rows_pad != n:
            feats_x = jnp.concatenate(
                [feats, jnp.zeros((n_rows_pad - n, d), feats.dtype)])
        else:
            feats_x = feats
        multiproc = _mesh_is_multiprocess(mesh)

        def put(a, spec):
            # multi-process: committed local arrays can't be placed onto
            # non-addressable devices — build the global array from the
            # host copy every process already holds in this bring-up mode
            sh = NamedSharding(mesh, spec)
            if isinstance(a, jax.Array) and not a.is_fully_addressable:
                # already a GLOBAL array (features streamed through the
                # multi-process pipeline): np.asarray would throw and the
                # value never needs to leave the devices — reshard SPMD
                return jax.jit(lambda t: t, out_shardings=sh)(a)
            if multiproc:
                host = np.asarray(a)
                return jax.make_array_from_callback(
                    host.shape, sh, lambda idx: host[idx])
            return jax.device_put(a, sh)

        feats_x = put(feats_x, P("data", None))
        send_idx, recv_pos, _ = _plan_exchange(
            buckets, n_rows_pad, ndev, bucket_size)
        loop = _all_buckets_mesh(mesh, update_rule, reassign_dropped,
                                 bucket_size)
        logs, steps, births, sizes, active = loop(
            feats_x, put(send_idx, P("data", None, None)),
            put(recv_pos, P("data", None, None)),
            put(counts, P("data")), put(targets, P("data")),
            np.int32(max_size), np.int32(min_size),
        )
    else:
        logs, steps, births, sizes, active = _all_buckets(
            feats, jnp.asarray(bucket_idx), jnp.asarray(counts),
            jnp.asarray(targets), jnp.int32(max_size), jnp.int32(min_size),
            update_rule=update_rule, absorb=reassign_dropped,
        )
    logs = _to_host(logs)
    steps = _to_host(steps)
    births = _to_host(births)
    active = _to_host(active)
    pt.tick("bucket-merges")

    dropped_idx: list[int] = []
    merges_arr = _restamp_logs(logs, steps, counts, bucket_idx, n)
    pt.tick("merge-restamp")

    # Member expansion: the native runtime's linked-list pass when present,
    # then a fully VECTORIZED columnar filter (the per-cluster python loop
    # that used to follow it — dict of 2.17M lists — was the remaining
    # ~85 s host wall at the 10M tier). Python walk fallback keeps the
    # identical iteration order when the native lib is absent.
    rec = _native_reconstruction(buckets, logs, steps, births, active)
    if rec is not None:
        members_glob, sizes_r, root_bucket = rec
        members_glob = np.asarray(members_glob, dtype=np.int64)
        sizes_r = np.asarray(sizes_r, dtype=np.int64)
        valid = sizes_r >= min_size
        if valid.all():
            members_col = members_glob
            dropped_idx = []
        else:
            keep_rows = np.repeat(valid, sizes_r)
            members_col = members_glob[keep_rows]
            dropped_idx = members_glob[~keep_rows].tolist()
        offsets_col = np.concatenate([[0], np.cumsum(sizes_r[valid])])
        cols = _Clusters(members_col, offsets_col,
                         np.asarray(root_bucket)[valid])
    else:
        clusters_l: list[list[int]] = []
        bucket_l: list[int] = []
        for bi, members in enumerate(buckets):
            c = len(members)
            if c == 0:
                continue
            log_b = logs[bi][: int(steps[bi])]
            children = {int(new): (int(hi), int(lo))
                        for hi, lo, new in log_b}
            surviving = sorted(int(b) for b in births[bi][active[bi]])
            for birth in surviving:
                local = _leaf_indices(birth, c, children)
                global_members = [members[k] for k in local]
                if len(global_members) < min_size:
                    dropped_idx.extend(global_members)
                    continue
                clusters_l.append(global_members)
                bucket_l.append(bi)
        cols = _Clusters.from_lists(clusters_l, bucket_l)

    pt.tick("reconstruction")
    if reassign_dropped and dropped_idx:
        dropped_idx = _spill_bucket_local(
            feats, buckets, cols, dropped_idx, max_size
        )
        pt.tick("spill-local")
    if reassign_dropped and dropped_idx:
        dropped_idx = _spill_global(feats, cols, dropped_idx, max_size)
        pt.tick("spill-global")

    members_f, offsets_f = cols.finalize()
    pt.tick("finalize")
    return ClusterResult(
        merges=merges_arr,
        n_items=n,
        n_clusters_target=sum(int(t) for t in targets),
        members=members_f,
        offsets=offsets_f,
        ids=ids,
        dropped_idx=dropped_idx,
    )
