"""Fused short-sequence attention (ops/attention.py) vs the XLA path.

The kernel replaces jax.nn.dot_product_attention for the ViT towers'
short sequences on TPU (models/vit.py `attention` dispatch). Not
bit-identical by design (op order differs); these tests pin closeness at
f32/bf16 tolerance plus the dispatch rules.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imageclust_tpu.ops.attention import short_seq_attention


def _qkv(b, t, h, dh, dtype, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return tuple(jax.random.normal(k, (b, t, h, dh), dtype) for k in ks)


class TestShortSeqAttention:
    def test_matches_xla_f32(self):
        q, k, v = _qkv(4, 50, 12, 64, jnp.float32)
        ref = jax.nn.dot_product_attention(q, k, v)
        got = short_seq_attention(q, k, v, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_matches_xla_bf16(self):
        q, k, v = _qkv(2, 50, 12, 64, jnp.bfloat16, seed=1)
        ref = jax.nn.dot_product_attention(q, k, v).astype(jnp.float32)
        got = short_seq_attention(
            q, k, v, interpret=True).astype(jnp.float32)
        # bf16 inputs, f32 accumulation both sides: only output-rounding
        # level differences
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0.02, atol=0.02)

    def test_bh_padding_path(self):
        # block_bh that does not divide B*H exercises the zero-pad branch
        q, k, v = _qkv(3, 17, 5, 64, jnp.float32, seed=2)
        ref = jax.nn.dot_product_attention(q, k, v)
        got = short_seq_attention(q, k, v, block_bh=36, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_vit_dispatch_respects_env(self, monkeypatch):
        from imageclust_tpu.models import vit

        q, k, v = _qkv(2, 50, 4, 64, jnp.float32, seed=3)
        ref = jax.nn.dot_product_attention(q, k, v)
        # forced fused (interpret off-TPU): matches XLA within tolerance
        monkeypatch.setenv("IMAGECLUST_VIT_ATTN", "fused")
        got = vit.attention(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        # forced xla: bit-identical to the reference call
        monkeypatch.setenv("IMAGECLUST_VIT_ATTN", "xla")
        np.testing.assert_array_equal(
            np.asarray(vit.attention(q, k, v)), np.asarray(ref))
        # default off-TPU: XLA path (no Pallas dependency on CPU)
        monkeypatch.delenv("IMAGECLUST_VIT_ATTN")
        assert jax.default_backend() != "tpu"
        np.testing.assert_array_equal(
            np.asarray(vit.attention(q, k, v)), np.asarray(ref))
