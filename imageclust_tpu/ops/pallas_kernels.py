"""Pallas TPU kernel for the constrained-Ward merge loop's hot step.

:func:`merge_update_argmin` fuses the two halves of one merge iteration —
apply the previous merge's row/column update to the n x n distance matrix
(in place, aliased buffer) and reduce the next feasible-pair argmin with the
Go-scan-order tie-break (imageclust_tpu/cluster/ward.py) — into ONE streamed
pass over the matrix in 128-row stripes. The unfused XLA body reads the
matrix several times per merge (validity/feasibility masks, E, bhi/blo tie
planes) plus a separate scatter-update pass; measured on a v5 lite chip the
fused loop is 3.0x faster at n=4096 (724 -> 240 us/merge) with bit-identical
merge logs. It is the DEFAULT single-device exact path on TPU
(IMAGECLUST_FUSED_MERGE=0 opts out; =1 forces interpret mode off-TPU for
tests).

Two earlier kernels were retired by measurement (see BASELINE.md round-2
notes): an argmin-only kernel (perf-neutral in the production loop — its
cross-program accumulator serialized the stripe pipeline, and update fusion
is where the win was) and a normalize/layout kernel (XLA already fuses the
uint8 normalize into the consumer; the s2d stem then removed the pass
entirely).

:func:`masked_argmin_pair_xla` is the plain-XLA formulation used by the
vmapped bucketed engine and the shard_map exact engine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["masked_argmin_pair_xla", "merge_update_argmin"]

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


def _merge_step_kernel(sa_ref, do_ref, max_size_ref,
                       D_ref, dvec_row_ref, dvec_full_ref,
                       row_births_ref, births_ref, row_sizes_ref, sizes_ref,
                       row_active_ref, active_ref,
                       D_out_ref, dmin_ref, pair_ref):
    """One stripe of the fused merge step: apply the PREVIOUS merge's row and
    column update to this stripe of D in place, then reduce this stripe's
    feasible-pair argmin partial. One read + one (aliased) write of the
    stripe per merge — vs the unfused path's separate update pass plus ~6
    n^2 intermediates in the argmin.

    Partials are written to per-stripe output blocks (no cross-program
    read-modify-write accumulator — that serialized the round-1 kernel's
    stripe pipeline); the caller reduces the tiny (grid, 3) triple set.
    """
    stripe = pl.program_id(0)
    T = D_ref.shape[0]
    n = D_ref.shape[1]
    sa = sa_ref[0]
    do_update = do_ref[0]
    max_size = max_size_ref[0]

    row0 = stripe * T
    row_ids = row0 + jax.lax.broadcasted_iota(jnp.int32, (T, n), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (T, n), 1)

    d = D_ref[...]
    upd_col = jnp.broadcast_to(dvec_row_ref[...].reshape(T, 1), (T, n))
    upd_row = jnp.broadcast_to(dvec_full_ref[...], (T, n))
    d_new = jnp.where(col_ids == sa, upd_col, d)
    d_new = jnp.where(row_ids == sa, upd_row, d_new)
    d = jnp.where(do_update != 0, d_new, d)
    D_out_ref[...] = d

    births_r = jnp.broadcast_to(row_births_ref[...].reshape(T, 1), (T, n))
    births_c = jnp.broadcast_to(births_ref[...], (T, n))
    sizes_r = jnp.broadcast_to(row_sizes_ref[...].reshape(T, 1), (T, n))
    act_r = jnp.broadcast_to(row_active_ref[...].reshape(T, 1), (T, n)) > 0
    act_c = jnp.broadcast_to(active_ref[...], (T, n)) > 0

    ok = act_r & act_c & (row_ids != col_ids)
    ok &= (sizes_r + jnp.broadcast_to(sizes_ref[...], (T, n))) <= max_size
    e = jnp.where(ok, d, jnp.inf)

    dmin = jnp.min(e)
    tie = ok & (e == dmin)
    bhi = jnp.maximum(births_r, births_c)
    blo = jnp.minimum(births_r, births_c)
    m1 = jnp.min(jnp.where(tie, bhi, _BIG_I32))
    m2 = jnp.min(jnp.where(tie & (bhi == m1), blo, _BIG_I32))

    # block shape is (1, 8, 128): dim 0 is the blocked grid axis — address
    # the (8, 128) plane with dims 1 and 2
    rows = jax.lax.broadcasted_iota(jnp.int32, dmin_ref.shape, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, dmin_ref.shape, 2)
    dmin_ref[...] = jnp.where((rows == 0) & (cols == 0), dmin,
                              jnp.inf).astype(jnp.float32)
    pair_ref[...] = jnp.where(
        (rows == 0) & (cols == 0), m1,
        jnp.where((rows == 0) & (cols == 1), m2, _BIG_I32),
    ).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def merge_update_argmin(D, dvec, sa, do_update, births, sizes, active,
                        max_size, interpret=False):
    """Fused constrained-Ward merge step (VERDICT r1 item 9's thesis).

    Applies the pending row/column-``sa`` update ``dvec`` to ``D`` IN PLACE
    (aliased buffer) and returns the next feasible-pair argmin with the Go
    tie-break, streaming the matrix once. births/sizes/active must already
    reflect the pending merge. Shapes: D (n, n) f32, n % 128 == 0; dvec (n,)
    f32; scalars i32. Returns (D, dmin, bhi, blo)."""
    n = D.shape[0]
    grid = n // _STRIPE
    dvec2 = dvec.reshape(1, n).astype(jnp.float32)
    births2 = births.reshape(1, n).astype(jnp.int32)
    sizes2 = sizes.reshape(1, n).astype(jnp.int32)
    active2 = active.reshape(1, n).astype(jnp.int32)
    scal = lambda v: jnp.reshape(jnp.asarray(v, jnp.int32), (1,))  # noqa: E731

    D_new, dmins, pairs = pl.pallas_call(
        _merge_step_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((_STRIPE, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _STRIPE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _STRIPE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _STRIPE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _STRIPE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_STRIPE, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, n), jnp.float32),
            jax.ShapeDtypeStruct((grid, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((grid, 8, 128), jnp.int32),
        ),
        input_output_aliases={3: 0},  # D updated in place
        interpret=interpret,
    )(scal(sa), scal(do_update), scal(max_size),
      D, dvec2, dvec2, births2, births2, sizes2, sizes2, active2, active2)

    # lexicographic reduce of the per-stripe partial triples (grid entries)
    p_d = dmins[:, 0, 0]
    p_hi = pairs[:, 0, 0]
    p_lo = pairs[:, 0, 1]
    dmin = jnp.min(p_d)
    at = p_d == dmin
    m1 = jnp.min(jnp.where(at, p_hi, _BIG_I32))
    m2 = jnp.min(jnp.where(at & (p_hi == m1), p_lo, _BIG_I32))
    return D_new, dmin, m1, m2
