"""Vision Transformer image towers (CLIP / SigLIP families), TPU-first.

The reference supports exactly one embedder (ResNet50 ONNX logits through
OpenCV DNN, internal/embeddings/embeddings.go:119-163). The TPU rebuild makes
the embedder pluggable (BASELINE.json configs 2-5: CLIP ViT-B/32, ViT-L/14
@336, SigLIP-So400m), so clustering quality can scale past 1000-d ImageNet
logits. These towers are written for the MXU: all compute in bfloat16,
LayerNorms in float32, patchify as one big conv, attention via
``jax.nn.dot_product_attention``.

Weight ingestion from HuggingFace CLIP/SigLIP torch checkpoints lives in
:func:`load_clip_vision_torch` (gated: used only when a local checkpoint is
present — the image has no network egress).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "ViTConfig",
    "VisionTransformer",
    "VIT_CONFIGS",
    "load_clip_vision_torch",
    "attention",
]

# Sequences at or under this length use the fused Pallas attention kernel on
# TPU (ops/attention.py): the whole per-(batch, head) problem is one VMEM
# tile, so the (B, H, T, T) logits/probability planes never touch HBM.
# Longer sequences (ViT-B/16's 197+) stay on the XLA path, which tiles them
# properly. IMAGECLUST_VIT_ATTN=xla|fused overrides either way.
_FUSED_ATTN_MAX_SEQ = 128


def attention(q, k, v):
    """Attention dispatch for the towers: fused short-seq Pallas kernel on
    TPU when the sequence fits one VMEM tile, XLA otherwise. Layouts and
    numerics match ``jax.nn.dot_product_attention`` (tolerance-based — op
    order differs in the fused path; see ops/attention.py)."""
    mode = os.environ.get("IMAGECLUST_VIT_ATTN", "")
    use_fused = (
        mode == "fused"
        or (mode != "xla"
            and q.shape[1] <= _FUSED_ATTN_MAX_SEQ
            and jax.default_backend() == "tpu")
    )
    if use_fused:
        from imageclust_tpu.ops.attention import short_seq_attention
        return short_seq_attention(
            q, k, v, interpret=jax.default_backend() != "tpu")
    return jax.nn.dot_product_attention(q, k, v)


@dataclass(frozen=True)
class ViTConfig:
    patch: int
    width: int
    depth: int
    heads: int
    proj_dim: int
    image_size: int = 224
    use_class_token: bool = True
    quick_gelu: bool = True  # CLIP's x * sigmoid(1.702 x)
    # preprocessing (CLIP normalization; the resnet50 path keeps the
    # reference's raw 1/255 pixels instead)
    mean: tuple[float, float, float] = (0.48145466, 0.4578275, 0.40821073)
    std: tuple[float, float, float] = (0.26862954, 0.26130258, 0.27577711)


VIT_CONFIGS: dict[str, ViTConfig] = {
    "vit_b32": ViTConfig(patch=32, width=768, depth=12, heads=12, proj_dim=512),
    "vit_b16": ViTConfig(patch=16, width=768, depth=12, heads=12, proj_dim=512),
    "vit_l14": ViTConfig(patch=14, width=1024, depth=24, heads=16, proj_dim=768),
    "vit_l14_336": ViTConfig(
        patch=14, width=1024, depth=24, heads=16, proj_dim=768, image_size=336
    ),
    "siglip_so400m": ViTConfig(
        patch=14, width=1152, depth=27, heads=16, proj_dim=1152,
        use_class_token=False, quick_gelu=False,
        mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
    ),
}


def _gelu(x, quick: bool):
    if quick:
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x, approximate=False)


class EncoderBlock(nn.Module):
    cfg: ViTConfig
    dtype: Any = jnp.bfloat16
    norm_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.norm_dtype,
                                       param_dtype=jnp.float32, name=name)
        dense = lambda d, name: nn.Dense(d, dtype=self.dtype,
                                         param_dtype=jnp.float32, name=name)
        y = ln("ln1")(x).astype(self.dtype)
        b, t, _ = y.shape
        head_dim = c.width // c.heads
        q = dense(c.width, "q")(y).reshape(b, t, c.heads, head_dim)
        k = dense(c.width, "k")(y).reshape(b, t, c.heads, head_dim)
        v = dense(c.width, "v")(y).reshape(b, t, c.heads, head_dim)
        attn = attention(q, k, v)
        attn = dense(c.width, "proj")(attn.reshape(b, t, c.width))
        x = x + attn.astype(x.dtype)

        y = ln("ln2")(x).astype(self.dtype)
        y = dense(c.width * 4, "mlp_up")(y)
        y = _gelu(y, c.quick_gelu)
        y = dense(c.width, "mlp_down")(y)
        return x + y.astype(x.dtype)


class VisionTransformer(nn.Module):
    """CLIP/SigLIP-style image tower. Input NCHW or NHWC float, already
    normalized per ``ViTConfig.mean/std``. Returns the projected embedding
    (B, proj_dim)."""

    cfg: ViTConfig
    dtype: Any = jnp.bfloat16
    # LayerNorm compute dtype: float32 default (LN statistics are precision-
    # sensitive); bfloat16 fuses into surrounding matmuls
    norm_dtype: Any = jnp.float32
    # rematerialize encoder blocks: trades recompute for activation memory —
    # lets ViT-L/14@336 train/embed at large batch on one chip
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        c = self.cfg
        if x.shape[1] == 3:
            x = jnp.transpose(x, (0, 2, 3, 1))
        x = x.astype(self.dtype)
        # patchify: one conv = one big matmul on the MXU
        x = nn.Conv(
            c.width, (c.patch, c.patch), strides=(c.patch, c.patch),
            use_bias=not c.use_class_token,  # CLIP's patch conv has no bias
            dtype=self.dtype, param_dtype=jnp.float32, name="patch",
        )(x)
        b, gh, gw, _ = x.shape
        x = x.reshape(b, gh * gw, c.width)

        if c.use_class_token:
            cls = self.param("class_token", nn.initializers.normal(0.02),
                             (1, 1, c.width), jnp.float32)
            x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, c.width)).astype(x.dtype), x], axis=1)
        n_tok = x.shape[1]
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, n_tok, c.width), jnp.float32)
        x = x + pos.astype(x.dtype)

        if c.use_class_token:
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                             param_dtype=jnp.float32, name="ln_pre")(x).astype(self.dtype)
        block_cls = nn.remat(EncoderBlock) if self.remat else EncoderBlock
        for i in range(c.depth):
            x = block_cls(c, dtype=self.dtype, norm_dtype=self.norm_dtype,
                          name=f"block{i}")(x)

        if c.use_class_token:
            feat = x[:, 0]
        else:
            feat = jnp.mean(x, axis=1)
        feat = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                            param_dtype=jnp.float32, name="ln_post")(feat)
        emb = nn.Dense(c.proj_dim, use_bias=False, dtype=jnp.float32,
                       param_dtype=jnp.float32, name="projection")(feat.astype(jnp.float32))
        if return_features:
            return emb, feat.astype(jnp.float32)
        return emb


def load_clip_vision_torch(state_dict, cfg: ViTConfig, variables: dict) -> dict:
    """Map a HuggingFace CLIPVisionModel(+projection) torch state_dict onto
    our parameter tree. Accepts tensors or numpy arrays. Raises ValueError on
    any missing/mismatched tensor."""
    sd = {
        k.replace("vision_model.", ""): np.asarray(v)
        for k, v in state_dict.items()
    }
    p: dict = {}

    def put(path, arr, want_shape):
        arr = np.asarray(arr, dtype=np.float32)
        if tuple(arr.shape) != tuple(want_shape):
            raise ValueError(f"{'/'.join(path)}: {arr.shape} != {want_shape}")
        node = p
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = jnp.asarray(arr)

    ref = variables["params"]
    put(("patch", "kernel"),
        np.transpose(sd["embeddings.patch_embedding.weight"], (2, 3, 1, 0)),
        ref["patch"]["kernel"].shape)
    if cfg.use_class_token:
        put(("class_token",), sd["embeddings.class_embedding"].reshape(1, 1, -1),
            ref["class_token"].shape)
        put(("ln_pre", "scale"), sd["pre_layrnorm.weight"], ref["ln_pre"]["scale"].shape)
        put(("ln_pre", "bias"), sd["pre_layrnorm.bias"], ref["ln_pre"]["bias"].shape)
    put(("pos_embed",),
        sd["embeddings.position_embedding.weight"][None],
        ref["pos_embed"].shape)
    for i in range(cfg.depth):
        hf = f"encoder.layers.{i}"
        blk = f"block{i}"
        pairs = [
            (("ln1",), f"{hf}.layer_norm1"),
            (("ln2",), f"{hf}.layer_norm2"),
        ]
        for ours, theirs in pairs:
            put((blk, *ours, "scale"), sd[f"{theirs}.weight"],
                ref[blk][ours[0]]["scale"].shape)
            put((blk, *ours, "bias"), sd[f"{theirs}.bias"],
                ref[blk][ours[0]]["bias"].shape)
        lin = [
            ("q", "self_attn.q_proj"), ("k", "self_attn.k_proj"),
            ("v", "self_attn.v_proj"), ("proj", "self_attn.out_proj"),
            ("mlp_up", "mlp.fc1"), ("mlp_down", "mlp.fc2"),
        ]
        for ours, theirs in lin:
            put((blk, ours, "kernel"), sd[f"{hf}.{theirs}.weight"].T,
                ref[blk][ours]["kernel"].shape)
            put((blk, ours, "bias"), sd[f"{hf}.{theirs}.bias"],
                ref[blk][ours]["bias"].shape)
    put(("ln_post", "scale"), sd["post_layernorm.weight"], ref["ln_post"]["scale"].shape)
    put(("ln_post", "bias"), sd["post_layernorm.bias"], ref["ln_post"]["bias"].shape)
    proj_key = "visual_projection.weight"
    if proj_key in sd:
        put(("projection", "kernel"), sd[proj_key].T,
            ref["projection"]["kernel"].shape)
    else:
        p["projection"] = {"kernel": ref["projection"]["kernel"]}
    return {"params": p}
