"""Post-training int8 quantization for the ViT towers (serving only).

The resnet50 int8 path (models/quantize.py) halves HBM traffic where the
CNN is bandwidth-bound. The transformer towers have the opposite profile:
ViT-L/14 and SigLIP measure at 90-95% of the box's practical bf16 peak
(BASELINE.md) — they are COMPUTE-walled, and the only lever left is
changing the arithmetic itself. The TPU MXU runs int8 x int8 -> int32 at
~2x its bf16 rate, so W8A8 on the encoder matmuls raises the wall rather
than approaching it.

Same TPU-first shape as the CNN path — the quantized forward is a pure
function over a params pytree:

* quantized: every encoder Dense (q/k/v, attention out-proj, mlp up/down)
  — weights symmetric per-output-channel int8, activations symmetric
  per-tensor int8 with scales calibrated from one captured f32 forward
  (q/k/v share one input scale: they read the same LayerNorm output),
* kept in bf16/f32: the patchify conv (<5% of FLOPs, 8-bit input), the
  attention itself (softmax(QK^T)V — classic W8A8 leaves it alone),
  LayerNorms (f32, precision-sensitive), and the final projection
  (tiny, parity-sensitive),
* int32 MXU accumulation via ``preferred_element_type``; dequant + bias
  fuse into each matmul's epilogue, the next quantize into its producer.

Quality: per-channel W8A8 on ViT encoders classically costs <0.5% zero-shot
accuracy. As with the CNN path, no pretrained weights exist in this image,
so the in-suite guard is structural (int8-vs-f32 cosine on random init);
production users calibrate on a sample of their corpus via
IMAGECLUST_CALIB_NPY. Reference has a single CPU embedder
(internal/embeddings/embeddings.go:119-163); the towers themselves are
this rebuild's extension (BASELINE.json configs 2-5).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from imageclust_tpu.models.vit import ViTConfig, _gelu, attention

__all__ = ["quantize_vit", "vit_quant_apply"]

_EPS = 1e-12

_QDENSE = ("q", "k", "v", "proj", "mlp_up", "mlp_down")
# which captured activation scale each quantized Dense consumes
_ACT_KEY = {"q": "attn_in", "k": "attn_in", "v": "attn_in",
            "proj": "attn_out", "mlp_up": "mlp_in", "mlp_down": "mlp_mid"}


def _ln(p: dict, x, eps: float = 1e-5):
    """f32 LayerNorm matching flax.linen.LayerNorm numerics."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return y * p["scale"] + p["bias"]


def _qdense(p: dict, x, act_dtype):
    """int8 matmul: per-tensor input quantize (fuses into the producer),
    int32 MXU accumulation, per-output-channel dequant + bias epilogue."""
    sx = p["act_scale"]
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127)
    xq = xq.astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, p["kernel_q"],
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (sx * p["w_scale"]) + p["bias"]
    return y.astype(act_dtype)


def _fdense(p: dict, x, act_dtype):
    y = x.astype(act_dtype) @ p["kernel"].astype(act_dtype)
    return y + p["bias"].astype(y.dtype)


def _forward(params: dict, x, cfg: ViTConfig, *, quant: bool,
             act_dtype=jnp.bfloat16):
    """Shared forward for calibration (f32, collects per-matmul input stats)
    and int8 inference. Mirrors VisionTransformer.__call__ exactly (vit.py):
    patchify conv -> [class token] -> pos embed -> [ln_pre] -> encoder
    blocks -> pool -> ln_post -> projection. Returns (emb, stats)."""
    stats: dict[str, jax.Array] = {}

    def dense_op(p_blk, blk: str, name: str, x):
        if quant:
            return _qdense(p_blk[name], x, act_dtype)
        key = f"{blk}/{_ACT_KEY[name]}"
        if key not in stats:
            ax = jnp.abs(x.astype(jnp.float32))
            stats[key] = jnp.stack(
                [jnp.max(ax), jnp.quantile(ax.reshape(-1), 0.999)])
        return _fdense(p_blk[name], x, act_dtype)

    if x.shape[1] == 3 and x.shape[-1] != 3:  # NCHW -> NHWC
        x = jnp.transpose(x, (0, 2, 3, 1))
    x = x.astype(act_dtype)
    pk = params["patch"]["kernel"].astype(act_dtype)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, pk.shape, ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(
        x, pk, (cfg.patch, cfg.patch), ((0, 0), (0, 0)),
        dimension_numbers=dn)
    if "bias" in params["patch"]:
        x = x + params["patch"]["bias"].astype(x.dtype)
    b, gh, gw, _ = x.shape
    x = x.reshape(b, gh * gw, cfg.width)
    if cfg.use_class_token:
        cls = jnp.broadcast_to(
            params["class_token"], (b, 1, cfg.width)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)
    if cfg.use_class_token:
        x = _ln(params["ln_pre"], x).astype(act_dtype)

    hd = cfg.width // cfg.heads
    for i in range(cfg.depth):
        blk = f"block{i}"
        p = params[blk]
        y = _ln(p["ln1"], x).astype(act_dtype)
        t = y.shape[1]
        q = dense_op(p, blk, "q", y).reshape(b, t, cfg.heads, hd)
        k = dense_op(p, blk, "k", y).reshape(b, t, cfg.heads, hd)
        v = dense_op(p, blk, "v", y).reshape(b, t, cfg.heads, hd)
        attn = attention(q, k, v).reshape(b, t, cfg.width)
        x = x + dense_op(p, blk, "proj", attn).astype(x.dtype)
        y = _ln(p["ln2"], x).astype(act_dtype)
        y = dense_op(p, blk, "mlp_up", y)
        y = _gelu(y, cfg.quick_gelu)
        x = x + dense_op(p, blk, "mlp_down", y).astype(x.dtype)

    feat = x[:, 0] if cfg.use_class_token else jnp.mean(x, axis=1)
    feat = _ln(params["ln_post"], feat)
    emb = feat.astype(jnp.float32) @ params["projection"]["kernel"].astype(
        jnp.float32)
    return emb, stats


@partial(jax.jit, static_argnames=("cfg",))
def _calib_forward(params, x, cfg: ViTConfig):
    return _forward(params, x, cfg, quant=False, act_dtype=jnp.float32)


def vit_quant_apply(qparams: dict, x, cfg: ViTConfig, *,
                    act_dtype=jnp.bfloat16):
    """Quantized inference forward: normalized float batch in (NHWC or
    NCHW, exactly what the f32 tower takes), (B, proj_dim) f32 out. Jit at
    the call site (the registry does)."""
    emb, _ = _forward(qparams, x, cfg, quant=True, act_dtype=act_dtype)
    return emb


def quantize_vit(
    variables: dict,
    cfg: ViTConfig,
    calib_images,  # (B, H, W, 3) or (B, 3, H, W) float, normalized
    *,
    margin: float = 1.05,
    calib_method: str = "absmax",
) -> dict:
    """Calibrate activation scales on one f32 forward and quantize every
    encoder Dense to per-output-channel int8. ``variables`` is the standard
    ``VisionTransformer`` tree (random init or
    :func:`~imageclust_tpu.models.vit.load_clip_vision_torch` output).
    ``margin``/``calib_method`` follow :func:`~imageclust_tpu.models.
    quantize.quantize_resnet50` ("absmax" | "p999")."""
    if calib_method not in ("absmax", "p999"):
        raise ValueError(f"unknown calib_method {calib_method!r}")
    stat_idx = 0 if calib_method == "absmax" else 1
    params = variables["params"]
    calib = jnp.asarray(np.asarray(calib_images, np.float32))
    _, stats = _calib_forward(params, calib, cfg)
    stats = jax.device_get(stats)

    q: dict[str, Any] = {
        k: params[k]
        for k in ("patch", "pos_embed", "ln_post", "projection")
    }
    if cfg.use_class_token:
        q["class_token"] = params["class_token"]
        q["ln_pre"] = params["ln_pre"]
    for i in range(cfg.depth):
        blk = f"block{i}"
        src = params[blk]
        dst: dict[str, Any] = {"ln1": src["ln1"], "ln2": src["ln2"]}
        for name in _QDENSE:
            w = np.asarray(src[name]["kernel"], np.float64)  # (in, out)
            w_scale = np.maximum(np.abs(w).max(axis=0) / 127.0, _EPS)
            wq = np.clip(np.rint(w / w_scale), -127, 127).astype(np.int8)
            sx = float(
                stats[f"{blk}/{_ACT_KEY[name]}"][stat_idx]) * margin / 127.0
            dst[name] = {
                "kernel_q": jnp.asarray(wq),
                "w_scale": jnp.asarray(w_scale.astype(np.float32)),
                "bias": src[name]["bias"],
                "act_scale": jnp.float32(max(sx, _EPS)),
            }
        q[blk] = dst
    return q
