"""Fused short-sequence attention for the ViT towers (Pallas, TPU).

Why this exists: ViT-B/32 is the one tower below this box's practical peak
(BASELINE.md recalibration: 61% vs 80-95% for the others), and the ablation
(tools/vit_ablation.py) attributes the gap to the attention sublayer's
50-token geometry, not to the projections. At seq=50 the XLA attention path
(jax.nn.dot_product_attention -> einsum BTNH,BSNH->BNTS -> f32 softmax ->
einsum BNTS,BSNH->BTNH) materializes the (B, H, T, T) logits and probability
planes in HBM and pays batched-matmul relayouts around them; the matmuls
themselves are ~1% of the tower's FLOPs, so the sublayer is pure overhead
traffic.

:func:`short_seq_attention` computes softmax(QK^T / sqrt(Dh)) V for an
entire chunk of (batch, head) pairs in ONE kernel: Q/K/V tiles stay in VMEM,
the (T, T) logits never exist in HBM, and the only HBM traffic is the
unavoidable Q/K/V read + O write. Sequences up to ~128 tokens fit this
pattern (everything per pair is a single VMEM tile); the ViT towers here run
T = 50 (B/32), 197 (B/16 — above the cutover, stays on XLA), 257, 577, 730.

Numerics match jax.nn.dot_product_attention's defaults: bf16 MXU inputs with
f32 accumulation for the logits, f32 softmax, probabilities cast back to the
value dtype for the AV matmul with f32 accumulation. Not bit-identical (op
order differs) — the towers' embedding contract is tolerance-based, same as
every other scheduling change (tests pin cosine/allclose vs the XLA path).

Replaces (TPU-natively) the per-image serialized OpenCV forward of the
reference's embedding stage (internal/embeddings/embeddings.go:119-163);
the reference has no transformer towers at all.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["short_seq_attention"]


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # q/k/v block: (G, T, Dh) in VMEM. Logits in f32 via MXU accumulation;
    # softmax in f32; probs cast to the value dtype for the AV pass.
    s = jax.lax.dot_general(
        q_ref[:], k_ref[:],
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # (G, T, T)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[:],
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (G, T, Dh)
    o_ref[:] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_bh", "interpret"))
def short_seq_attention(q, k, v, *, block_bh: int = 0,
                        interpret: bool = False):
    """softmax(Q K^T / sqrt(Dh)) V, fused, for short sequences.

    Args:
      q, k, v: (B, T, H, Dh) — the jax.nn.dot_product_attention layout the
        towers already produce (B batch, T tokens, H heads, Dh head dim).
      block_bh: (batch, head) pairs processed per kernel program. VMEM per
        program is ~4 * block_bh * T * 128 * itemsize plus the (block_bh,
        T_pad, T_pad) f32 logits tile — block_bh=32 at T=50 is ~2.5 MB.
        0 (default) picks 32 up to T=64 (the measured ViT-B/32 config) and
        scales down quadratically-ish with T to stay a few MB.
      interpret: run the Pallas interpreter (CPU tests).

    Returns (B, T, H, Dh) in q's dtype.
    """
    B, T, H, Dh = q.shape
    if block_bh == 0:
        block_bh = 32 if T <= 64 else (16 if T <= 128 else 8)
    scale = 1.0 / math.sqrt(Dh)
    bh = B * H

    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(bh, T, Dh)

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)
    pad = (-bh) % block_bh
    if pad:
        # padded pairs compute softmax over zero logits (uniform rows) on
        # zero values -> zero output; sliced off below
        z = ((0, pad), (0, 0), (0, 0))
        qb, kb, vb = (jnp.pad(x, z) for x in (qb, kb, vb))
    grid = ((bh + pad) // block_bh,)
    spec = pl.BlockSpec((block_bh, T, Dh), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bh + pad, T, Dh), q.dtype),
        interpret=interpret,
    )(qb, kb, vb)
    if pad:
        out = out[:bh]
    return out.reshape(B, H, T, Dh).transpose(0, 2, 1, 3)
