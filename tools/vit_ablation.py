"""Stage-ablated ViT-B/32 timing: find where the 39% headroom hides.

BASELINE.md puts ViT-B/32 at 61% of the practical peak — the only tower
not at the wall (ViT-L/14 90%, SigLIP 95%). This tool times the tower's
stages in isolation on the real chip so the loss can be attributed:

  full       whole tower (normalized f32 input -> proj embedding)
  patchify   the stride-32 conv alone
  encoder    the 12-block stack alone on (B, 50, 768) bf16 tokens
  encoder64  same stack on seq padded 50 -> 64 (alignment experiment;
             timing-only — no masking, so outputs are not comparable)
  attn       the 12 attention sublayers alone (LN + QKV + attn + proj)
  mlp        the 12 MLP sublayers alone (LN + up + gelu + down)
  head       final LN + f32 projection

Prints one JSON line per stage: ms/batch, img/s, and XLA-counted TF/s
(compiled.cost_analysis()['flops']). Random init — timing only.

Usage: python tools/vit_ablation.py [--batch 1024] [--iters 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--model", default="vit_b32")
    args = ap.parse_args()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from imageclust_tpu.models.vit import (
        VIT_CONFIGS, EncoderBlock, VisionTransformer)

    cfg = VIT_CONFIGS[args.model]
    b = args.batch
    rng = jax.random.PRNGKey(0)
    n_tok = (cfg.image_size // cfg.patch) ** 2 + (1 if cfg.use_class_token
                                                  else 0)

    class Stack(nn.Module):
        """The encoder stack alone (no patchify/pos/head)."""
        mode: str  # "full" | "attn" | "mlp"

        @nn.compact
        def __call__(self, x):
            for i in range(cfg.depth):
                if self.mode == "full":
                    x = EncoderBlock(cfg, name=f"block{i}")(x)
                    continue
                ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                  param_dtype=jnp.float32, name=f"ln{i}")
                dense = lambda d, name: nn.Dense(
                    d, dtype=jnp.bfloat16, param_dtype=jnp.float32, name=name)
                y = ln(x).astype(jnp.bfloat16)
                if self.mode == "attn":
                    bt, t, _ = y.shape
                    hd = cfg.width // cfg.heads
                    q = dense(cfg.width, f"q{i}")(y).reshape(
                        bt, t, cfg.heads, hd)
                    k = dense(cfg.width, f"k{i}")(y).reshape(
                        bt, t, cfg.heads, hd)
                    v = dense(cfg.width, f"v{i}")(y).reshape(
                        bt, t, cfg.heads, hd)
                    a = jax.nn.dot_product_attention(q, k, v)
                    y = dense(cfg.width, f"proj{i}")(
                        a.reshape(bt, t, cfg.width))
                else:  # mlp
                    y = dense(cfg.width * 4, f"up{i}")(y)
                    y = y * jax.nn.sigmoid(1.702 * y)
                    y = dense(cfg.width, f"down{i}")(y)
                x = x + y.astype(x.dtype)
            return x

    class Head(nn.Module):
        @nn.compact
        def __call__(self, feat):
            feat = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                param_dtype=jnp.float32)(feat)
            return nn.Dense(cfg.proj_dim, use_bias=False, dtype=jnp.float32,
                            param_dtype=jnp.float32)(
                feat.astype(jnp.float32))

    class Patch(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(cfg.width, (cfg.patch, cfg.patch),
                           strides=(cfg.patch, cfg.patch),
                           use_bias=not cfg.use_class_token,
                           dtype=jnp.bfloat16, param_dtype=jnp.float32)(x)

    img = jax.random.normal(rng, (b, cfg.image_size, cfg.image_size, 3),
                            jnp.float32)
    tok = jax.random.normal(rng, (b, n_tok, cfg.width), jnp.bfloat16)
    tok64 = jax.random.normal(rng, (b, ((n_tok + 63) // 64) * 64, cfg.width),
                              jnp.bfloat16)
    feat = jax.random.normal(rng, (b, cfg.width), jnp.bfloat16)

    full = VisionTransformer(cfg)
    stages = {
        "full": (full, img),
        "patchify": (Patch(), img),
        "encoder": (Stack(mode="full"), tok),
        "encoder64": (Stack(mode="full"), tok64),
        "attn": (Stack(mode="attn"), tok),
        "mlp": (Stack(mode="mlp"), tok),
        "head": (Head(), feat),
    }

    for name, (mod, x) in stages.items():
        variables = jax.jit(mod.init)(rng, x)
        f = jax.jit(lambda v, x, m=mod: m.apply(v, x))
        lowered = f.lower(variables, x)
        compiled = lowered.compile()
        try:
            flops = compiled.cost_analysis()["flops"]
        except Exception:
            flops = float("nan")
        np.asarray(jax.tree_util.tree_leaves(f(variables, x))[0])  # warm
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = f(variables, x)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({
            "stage": name, "batch": b, "ms": round(dt * 1e3, 3),
            "img_per_s": round(b / dt, 1),
            "tf_per_s": round(flops / dt / 1e12, 2),
            "gflops_per_batch": round(flops / 1e9, 2),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
