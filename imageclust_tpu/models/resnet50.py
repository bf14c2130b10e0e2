"""ResNet50-v1 in Flax, architecture-matched to resnet50-v1-7.onnx.

The reference runs the ONNX model-zoo ResNet50 v1 (an MXNet-Gluon export —
layer names ``resnetv17_*``) through OpenCV DNN on CPU, one image at a time
behind a mutex (internal/embeddings/embeddings.go:28-43, :119-163), reading
the 1000-d logits layer ``resnetv17_dense0_fwd`` (embeddings.go:140) as the
"embedding". This module is the TPU replacement: the same computation as a
batched, jittable Flax model whose convs map onto the MXU.

Architecture (Gluon ``BottleneckV1``): 7x7/2 stem conv -> BN -> ReLU ->
3x3/2 maxpool -> 4 stages of [3, 4, 6, 3] bottleneck blocks (1x1(stride) ->
3x3 -> 1x1, projection shortcut on the first block of each stage) -> global
average pool -> 1000-way dense. Weights load from the ONNX checkpoint via
:mod:`imageclust_tpu.models.onnx_io`.

Outputs: ``logits`` (1000-d — parity with the reference's embedding) and
``pooled`` (2048-d features — the embedding a user should actually want).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ResNet50V1", "load_onnx_params", "fold_bn_variables",
           "GLUON_STAGE_LAYERS"]

GLUON_STAGE_LAYERS = (3, 4, 6, 3)
_STAGE_WIDTHS = (64, 128, 256, 512)  # bottleneck (inner) widths


class BottleneckV1(nn.Module):
    """Gluon BottleneckV1: stride lives on the FIRST 1x1 conv (ResNet v1,
    not the v1.5 variant that strides the 3x3).

    ``fold_bn=True`` is the inference layout: each conv carries a bias and
    the BatchNorm affine is pre-folded into (kernel, bias) by
    :func:`fold_bn_variables` — fewer HBM passes per block."""

    width: int
    stride: int
    project: bool
    dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(nn.Conv, use_bias=self.fold_bn, dtype=self.dtype,
                       param_dtype=jnp.float32)
        if self.fold_bn:
            bn = lambda name: (lambda y: y)  # noqa: E731 — folded away
        else:
            bn_mod = partial(nn.BatchNorm, use_running_average=not train,
                             momentum=0.9, epsilon=1e-5, dtype=self.norm_dtype,
                             param_dtype=jnp.float32)
            bn = lambda name: bn_mod(name=name)  # noqa: E731
        out_ch = self.width * 4

        y = conv(self.width, (1, 1), strides=(self.stride, self.stride),
                 name="conv0")(x)
        y = bn("bn0")(y)
        y = nn.relu(y)
        y = conv(self.width, (3, 3), padding=((1, 1), (1, 1)),
                 name="conv1")(y)
        y = bn("bn1")(y)
        y = nn.relu(y)
        y = conv(out_ch, (1, 1), name="conv2")(y)
        y = bn("bn2")(y)

        if self.project:
            x = conv(out_ch, (1, 1), strides=(self.stride, self.stride),
                     name="conv_proj")(x)
            x = bn("bn_proj")(x)

        return nn.relu(y + x.astype(y.dtype))


class _StemKernel(nn.Module):
    """Bare conv0 parameter holder for the s2d stem: creates the SAME
    params/conv0/{kernel[,bias]} tree entries nn.Conv would, so checkpoints
    and the standard stem interchange freely."""

    fold_bn: bool = False

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (7, 7, 3, 64), jnp.float32)
        b = (self.param("bias", nn.initializers.zeros, (64,), jnp.float32)
             if self.fold_bn else None)
        return k, b


class ResNet50V1(nn.Module):
    """Batched ResNet50 v1. Input is NCHW float32/bfloat16 (the blob layout
    the reference produces, embeddings.go:96-104); converted to NHWC
    internally (the TPU-friendly layout).

    ``stem_mode="s2d_raw"`` is the TPU fast path for the stem: input is RAW
    BGR uint8 NHWC (what the decoder produces), space-to-depth'd 2x2 to
    (H/2, W/2, 12), and conv0's 7x7/2 kernel is rewritten in-graph into the
    mathematically identical 4x4/1 kernel over 12 channels with the
    reference's 1/255 scale and BGR->RGB flip folded in
    (embeddings.go:82-96). 12 input channels tile the 128-lane MXU far
    better than 3 (the classic MLPerf-TPU ResNet trick), and the separate
    normalize pass over the full batch disappears. Exact in real arithmetic
    (verified to f32 reduction-order noise)."""

    num_classes: int = 1000
    dtype: Any = jnp.bfloat16
    stage_layers: Sequence[int] = GLUON_STAGE_LAYERS
    # BatchNorm compute dtype. float32 is the parity default; bfloat16 lets
    # XLA fuse the scale/shift into conv epilogues without f32 round trips
    # (inference-safe: running stats are applied, not accumulated).
    norm_dtype: Any = jnp.float32
    # Inference layout: BatchNorm affines pre-folded into conv kernels and
    # biases (fold_bn_variables). train=True requires fold_bn=False.
    fold_bn: bool = False
    # "standard" (normalized float input) or "s2d_raw" (raw BGR uint8 input,
    # space-to-depth stem with scale/flip folded into the kernel).
    stem_mode: str = "standard"

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        if train and self.fold_bn:
            raise ValueError("fold_bn is an inference layout; train needs BN")
        if self.stem_mode == "s2d_raw":
            if x.ndim != 4 or x.shape[-1] != 3 or x.shape[1] % 2 or x.shape[2] % 2:
                raise ValueError(
                    f"s2d_raw stem needs raw NHWC (B,H,W,3) with even H/W, "
                    f"got {x.shape}"
                )
            w7, bias = _StemKernel(fold_bn=self.fold_bn, name="conv0")()
            # 7x7/2 pad3 kernel -> equivalent 4x4/1 kernel over the 2x2
            # space-to-depth channels; BGR flip + 1/255 scale folded in.
            w8 = jnp.zeros((8, 8, 3, 64), jnp.float32).at[1:8, 1:8].set(w7)
            parts = [w8[p::2, q::2, 2 - c, :]
                     for p in (0, 1) for q in (0, 1) for c in (0, 1, 2)]
            w12 = (jnp.stack(parts, axis=2) * (1.0 / 255.0)).astype(self.dtype)
            b_, h, w_, _ = x.shape
            xs = x.reshape(b_, h // 2, 2, w_ // 2, 2, 3)
            xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b_, h // 2, w_ // 2, 12)
            x = jax.lax.conv_general_dilated(
                xs.astype(self.dtype), w12, (1, 1), ((2, 1), (2, 1)),
                dimension_numbers=jax.lax.conv_dimension_numbers(
                    xs.shape, w12.shape, ("NHWC", "HWIO", "NHWC")),
            )
            if bias is not None:
                x = x + bias.astype(x.dtype)
        else:
            if x.shape[1] == 3:  # NCHW -> NHWC
                x = jnp.transpose(x, (0, 2, 3, 1))
            x = x.astype(self.dtype)
            x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                        use_bias=self.fold_bn, dtype=self.dtype,
                        param_dtype=jnp.float32, name="conv0")(x)
        if not self.fold_bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.norm_dtype,
                             param_dtype=jnp.float32, name="bn0")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for si, (n_blocks, width) in enumerate(
            zip(self.stage_layers, _STAGE_WIDTHS)
        ):
            stride = 1 if si == 0 else 2
            for bi in range(n_blocks):
                x = BottleneckV1(
                    width=width,
                    stride=stride if bi == 0 else 1,
                    project=bi == 0,
                    dtype=self.dtype,
                    norm_dtype=self.norm_dtype,
                    fold_bn=self.fold_bn,
                    name=f"stage{si + 1}_block{bi}",
                )(x, train=train)

        pooled = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # (B, 2048)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="dense0")(pooled)
        if return_features:
            return logits, pooled
        return logits


def fold_bn_variables(variables: dict) -> dict:
    """Fold every BatchNorm affine into its preceding conv: the standard
    inference transform. y = g*(conv(x)-m)/sqrt(v+eps)+b == conv'(x)+b' with
    W' = W*g/sqrt(v+eps) (per out-channel) and b' = b - g*m/sqrt(v+eps).
    Returns a variables tree for ``ResNet50V1(fold_bn=True)``. Exactly
    equivalent in real arithmetic; folding happens in float64 so the f32
    kernels round once.
    """
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])
    eps = 1e-5

    def fold(scope_p: dict, scope_s: dict, conv: str, bn: str, out: dict):
        w = np.asarray(scope_p[conv]["kernel"], np.float64)
        g = np.asarray(scope_p[bn]["scale"], np.float64)
        b = np.asarray(scope_p[bn]["bias"], np.float64)
        m = np.asarray(scope_s[bn]["mean"], np.float64)
        v = np.asarray(scope_s[bn]["var"], np.float64)
        inv = g / np.sqrt(v + eps)
        out[conv] = {
            "kernel": jnp.asarray((w * inv).astype(np.float32)),
            "bias": jnp.asarray((b - m * inv).astype(np.float32)),
        }

    folded: dict = {}
    fold(params, stats, "conv0", "bn0", folded)
    for name, scope in params.items():
        if not name.startswith("stage"):
            continue
        out_scope: dict = {}
        for conv, bn in (("conv0", "bn0"), ("conv1", "bn1"),
                         ("conv2", "bn2"), ("conv_proj", "bn_proj")):
            if conv in scope:
                fold(scope, stats[name], conv, bn, out_scope)
        folded[name] = out_scope
    folded["dense0"] = {
        "kernel": jnp.asarray(params["dense0"]["kernel"]),
        "bias": jnp.asarray(params["dense0"]["bias"]),
    }
    return {"params": folded}


def _gluon_name_map(stage_layers: Sequence[int] = GLUON_STAGE_LAYERS):
    """Map Gluon-ONNX initializer names (resnetv17_*) to our param paths.

    Gluon numbers convs/batchnorms in creation order within each stage scope:
    per block the 3 body convs first, then the projection conv of the first
    block (BottleneckV1 creates body before downsample)."""
    m: dict[str, tuple[str, ...]] = {}

    def conv(onnx, *path):
        m[f"{onnx}_weight"] = (*path, "kernel")

    def bnorm(onnx, *path):
        m[f"{onnx}_gamma"] = ("params_scale", *path, "scale")
        m[f"{onnx}_beta"] = ("params_bias", *path, "bias")
        m[f"{onnx}_running_mean"] = ("stats_mean", *path, "mean")
        m[f"{onnx}_running_var"] = ("stats_var", *path, "var")

    conv("resnetv17_conv0", "conv0")
    bnorm("resnetv17_batchnorm0", "bn0")
    for si, n_blocks in enumerate(stage_layers):
        stage = f"resnetv17_stage{si + 1}"
        k = 0
        for bi in range(n_blocks):
            blk = f"stage{si + 1}_block{bi}"
            for ci in range(3):
                conv(f"{stage}_conv{k}", blk, f"conv{ci}")
                bnorm(f"{stage}_batchnorm{k}", blk, f"bn{ci}")
                k += 1
            if bi == 0:
                conv(f"{stage}_conv{k}", blk, "conv_proj")
                bnorm(f"{stage}_batchnorm{k}", blk, "bn_proj")
                k += 1
    m["resnetv17_dense0_weight"] = ("dense0", "kernel")
    m["resnetv17_dense0_bias"] = ("dense0", "bias")
    return m


def _set_path(tree: dict, path: tuple[str, ...], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def load_onnx_params(
    onnx_path: str,
    variables: dict,
    stage_layers: Sequence[int] = GLUON_STAGE_LAYERS,
) -> dict:
    """Ingest resnet50-v1-7.onnx weights into a Flax variables tree.

    ``variables`` must be the output of ``ResNet50V1().init(...)``; its
    structure and shapes validate the conversion. Raises ValueError with a
    full diff when a tensor is missing or shaped wrong. The checkpoint blob
    is stripped from the reference mirror (.MISSING_LARGE_BLOBS:1), so
    callers fall back to random init when the file is absent.
    """
    from imageclust_tpu.models.onnx_io import read_onnx_initializers

    tensors = read_onnx_initializers(onnx_path)
    name_map = _gluon_name_map(stage_layers)

    params: dict = {}
    stats: dict = {}
    problems: list[str] = []
    for onnx_name, path in name_map.items():
        if onnx_name not in tensors:
            problems.append(f"missing initializer: {onnx_name}")
            continue
        arr = tensors[onnx_name]
        if path[0] == "params_scale" or path[0] == "params_bias":
            _set_path(params, path[1:], jnp.asarray(arr))
        elif path[0] == "stats_mean" or path[0] == "stats_var":
            _set_path(stats, path[1:], jnp.asarray(arr))
        elif path[-1] == "kernel" and arr.ndim == 4:
            # ONNX conv (out, in, kh, kw) -> Flax (kh, kw, in, out)
            _set_path(params, path, jnp.asarray(np.transpose(arr, (2, 3, 1, 0))))
        elif path[-1] == "kernel" and arr.ndim == 2:
            # Gluon dense (out, in) -> Flax (in, out)
            _set_path(params, path, jnp.asarray(arr.T))
        else:
            _set_path(params, path, jnp.asarray(arr))

    ref_params = variables["params"]
    ref_stats = variables["batch_stats"]
    problems += _shape_diff(ref_params, params, "params")
    problems += _shape_diff(ref_stats, stats, "batch_stats")
    if problems:
        raise ValueError(
            "ONNX->Flax conversion failed:\n  " + "\n  ".join(problems[:40])
        )
    return {"params": params, "batch_stats": stats}


def _shape_diff(ref, got, prefix: str) -> list[str]:
    out = []
    if isinstance(ref, dict):
        for k in ref:
            if not isinstance(got, dict) or k not in got:
                out.append(f"{prefix}/{k}: missing")
            else:
                out += _shape_diff(ref[k], got[k], f"{prefix}/{k}")
        if isinstance(got, dict):
            for k in got:
                if k not in ref:
                    out.append(f"{prefix}/{k}: unexpected")
    else:
        if ref.shape != got.shape:
            out.append(f"{prefix}: shape {got.shape} != expected {ref.shape}")
    return out
