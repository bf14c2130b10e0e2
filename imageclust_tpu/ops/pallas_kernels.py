"""Pallas TPU kernels for the framework's hot ops.

1. :func:`masked_argmin_pair` — the constrained-Ward merge loop's dominant
   per-iteration op: over the n x n distance matrix, find the minimum
   feasible pairwise distance together with the Go-scan-order tie-break
   (lexicographically smallest (birth_hi, birth_lo) among minima — see
   imageclust_tpu/cluster/ward.py). The XLA formulation materializes ~6
   full n^2 intermediates per merge (validity mask, feasibility mask, E,
   bhi, blo, tie masks); this kernel streams the matrix once per merge in
   128-row stripes and reduces everything on-chip, writing one partial
   triple per stripe.

2. :func:`normalize_chw` — fused uint8 HWC -> float32 CHW
   scale/mean/std (+BGR->RGB) layout conversion, the device half of the
   reference's BlobFromImage (embeddings.go:96).

Both kernels fall back to interpret mode off-TPU (tests run them on CPU via
``interpret=True``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["masked_argmin_pair", "masked_argmin_pair_xla", "normalize_chw"]

_STRIPE = 128
_BIG_I32 = np.int32(2**31 - 1)


def masked_argmin_pair_xla(D, births, sizes, active, max_size,
                           require_under=None):
    """Reference XLA implementation (the formulation inside
    cluster.ward._merge_body). Returns (dmin f32, bhi i32, blo i32).

    With ``require_under`` (an i32 min-size), only pairs where at least one
    side is below that size are feasible — the bucketed engine's absorb
    phase, which folds under-min clusters into their Ward-nearest neighbor
    instead of dropping their images (VERDICT r1 item 4)."""
    n = D.shape[0]
    valid = active[:, None] & active[None, :] & ~jnp.eye(n, dtype=bool)
    feas = (sizes[:, None] + sizes[None, :]) <= max_size
    if require_under is not None:
        under = sizes < require_under
        feas = feas & (under[:, None] | under[None, :])
    ok = valid & feas
    E = jnp.where(ok, D, jnp.inf)
    dmin = jnp.min(E)
    tie = ok & (E == dmin)
    bhi = jnp.maximum(births[:, None], births[None, :])
    blo = jnp.minimum(births[:, None], births[None, :])
    m1 = jnp.min(jnp.where(tie, bhi, _BIG_I32))
    m2 = jnp.min(jnp.where(tie & (bhi == m1), blo, _BIG_I32))
    return dmin, m1, m2


def _argmin_kernel(D_ref, row_births_ref, births_ref, row_sizes_ref,
                   sizes_ref, row_active_ref, active_ref, max_size_ref,
                   dmin_ref, pair_ref):
    """One grid step = one 128-row stripe of D reduced to a partial triple.

    The stripe's own births/sizes/active arrive as separately BLOCKED inputs
    (row_*): Mosaic has no dynamic_slice lowering, so per-stripe rows are
    selected by BlockSpec index maps instead of in-kernel slicing.
    """
    stripe = pl.program_id(0)
    n = D_ref.shape[1]
    T = D_ref.shape[0]

    d = D_ref[...]  # (T, n) f32
    births = births_ref[...]  # (1, n) i32 — full
    sizes = sizes_ref[...]  # (1, n) i32
    active = active_ref[...]  # (1, n) i32 (0/1)
    max_size = max_size_ref[0, 0]

    row0 = stripe * T
    row_ids = row0 + jax.lax.broadcasted_iota(jnp.int32, (T, n), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (T, n), 1)

    births_r = jnp.broadcast_to(row_births_ref[...].reshape(T, 1), (T, n))
    births_c = jnp.broadcast_to(births, (T, n))
    sizes_r = jnp.broadcast_to(row_sizes_ref[...].reshape(T, 1), (T, n))
    act_r = jnp.broadcast_to(row_active_ref[...].reshape(T, 1), (T, n)) > 0
    act_c = jnp.broadcast_to(active, (T, n)) > 0

    ok = act_r & act_c & (row_ids != col_ids)
    ok = ok & ((sizes_r + jnp.broadcast_to(sizes, (T, n))) <= max_size)
    e = jnp.where(ok, d, jnp.inf)

    dmin = jnp.min(e)
    tie = ok & (e == dmin)
    bhi = jnp.maximum(births_r, births_c)
    blo = jnp.minimum(births_r, births_c)
    m1 = jnp.min(jnp.where(tie, bhi, _BIG_I32))
    m2 = jnp.min(jnp.where(tie & (bhi == m1), blo, _BIG_I32))

    # Cross-stripe reduction happens IN the kernel: the outputs are one
    # shared (8, 128) accumulator block (TPU grids run sequentially, so
    # read-modify-write across programs is safe), updated with full-block
    # vector stores — Mosaic forbids scalar VMEM stores. The running best
    # triple lives at dmin[0,0] / pair[0,0..1].
    @pl.when(stripe == 0)
    def _():
        dmin_ref[...] = jnp.full(dmin_ref.shape, jnp.inf, jnp.float32)
        pair_ref[...] = jnp.full(pair_ref.shape, _BIG_I32, jnp.int32)

    cur_d = dmin_ref[0, 0]
    cur_hi = pair_ref[0, 0]
    cur_lo = pair_ref[0, 1]
    better = (dmin < cur_d) | (
        (dmin == cur_d)
        & ((m1 < cur_hi) | ((m1 == cur_hi) & (m2 < cur_lo)))
    )
    new_d = jnp.where(better, dmin, cur_d)
    new_hi = jnp.where(better, m1, cur_hi)
    new_lo = jnp.where(better, m2, cur_lo)

    rows = jax.lax.broadcasted_iota(jnp.int32, dmin_ref.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, dmin_ref.shape, 1)
    at00 = (rows == 0) & (cols == 0)
    at01 = (rows == 0) & (cols == 1)
    dmin_ref[...] = jnp.where(at00, new_d, jnp.inf).astype(jnp.float32)
    pair_ref[...] = jnp.where(
        at00, new_hi, jnp.where(at01, new_lo, _BIG_I32)
    ).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def masked_argmin_pair(D, births, sizes, active, max_size, interpret=False):
    """Pallas-tiled feasible-pair argmin with Go tie-break.

    Shapes: D (n, n) f32 with n a multiple of 128; births/sizes (n,) i32;
    active (n,) bool; max_size i32 scalar. Returns (dmin, bhi, blo).
    """
    n = D.shape[0]
    grid = n // _STRIPE
    births2 = births.reshape(1, n).astype(jnp.int32)
    sizes2 = sizes.reshape(1, n).astype(jnp.int32)
    active2 = active.reshape(1, n).astype(jnp.int32)
    max_size_arr = jnp.reshape(jnp.asarray(max_size, jnp.int32), (1, 1))

    dmins, pairs = pl.pallas_call(
        _argmin_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_STRIPE, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            # the stripe's own rows, selected via index maps (no in-kernel
            # dynamic_slice — Mosaic can't lower it)
            pl.BlockSpec((1, _STRIPE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _STRIPE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _STRIPE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.int32),
        ),
        interpret=interpret,
    )(D, births2, births2, sizes2, sizes2, active2, active2, max_size_arr)

    # the kernel reduced across stripes in-place; read the winning triple
    return dmins[0, 0], pairs[0, 0], pairs[0, 1]


def _normalize_kernel(img_ref, scale_ref, mean_ref, std_ref, out_ref, *,
                      bgr_to_rgb: bool):
    """(H, W, 3) uint8 -> (3, H, W) f32 normalized, one image per program."""
    img = img_ref[0].astype(jnp.float32)  # (H, W, 3)
    scale = scale_ref[0, 0]
    for c in range(3):
        src_c = 2 - c if bgr_to_rgb else c
        out_ref[0, c, :, :] = (
            (img[:, :, src_c] * scale - mean_ref[0, c]) / std_ref[0, c]
        )


@functools.partial(
    jax.jit, static_argnames=("bgr_to_rgb", "interpret")
)
def normalize_chw(images, scale, mean, std, bgr_to_rgb=True, interpret=False):
    """Fused uint8 (B,H,W,3) -> f32 (B,3,H,W) normalize + layout kernel."""
    b, h, w, _ = images.shape
    mean_a = jnp.asarray(mean, jnp.float32).reshape(1, 3)
    std_a = jnp.asarray(std, jnp.float32).reshape(1, 3)
    scale_a = jnp.reshape(jnp.asarray(scale, jnp.float32), (1, 1))

    kernel = functools.partial(_normalize_kernel, bgr_to_rgb=bgr_to_rgb)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, 3), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, h, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 3, h, w), jnp.float32),
        interpret=interpret,
    )(images, scale_a, mean_a, std_a)
