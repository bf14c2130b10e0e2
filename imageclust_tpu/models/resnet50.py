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

__all__ = ["ResNet50V1", "load_onnx_params", "GLUON_STAGE_LAYERS"]

GLUON_STAGE_LAYERS = (3, 4, 6, 3)
_STAGE_WIDTHS = (64, 128, 256, 512)  # bottleneck (inner) widths


class BottleneckV1(nn.Module):
    """Gluon BottleneckV1: stride lives on the FIRST 1x1 conv (ResNet v1,
    not the v1.5 variant that strides the 3x3)."""

    width: int
    stride: int
    project: bool
    dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32)
        bn = partial(nn.BatchNorm, use_running_average=not train,
                     momentum=0.9, epsilon=1e-5, dtype=self.norm_dtype,
                     param_dtype=jnp.float32)
        out_ch = self.width * 4

        y = conv(self.width, (1, 1), strides=(self.stride, self.stride),
                 name="conv0")(x)
        y = bn(name="bn0")(y)
        y = nn.relu(y)
        y = conv(self.width, (3, 3), padding=((1, 1), (1, 1)),
                 name="conv1")(y)
        y = bn(name="bn1")(y)
        y = nn.relu(y)
        y = conv(out_ch, (1, 1), name="conv2")(y)
        y = bn(name="bn2")(y)

        if self.project:
            x = conv(out_ch, (1, 1), strides=(self.stride, self.stride),
                     name="conv_proj")(x)
            x = bn(name="bn_proj")(x)

        return nn.relu(y + x.astype(y.dtype))


class ResNet50V1(nn.Module):
    """Batched ResNet50 v1. Input is NCHW float32/bfloat16 (the blob layout
    the reference produces, embeddings.go:96-104); converted to NHWC
    internally (the TPU-friendly layout)."""

    num_classes: int = 1000
    dtype: Any = jnp.bfloat16
    stage_layers: Sequence[int] = GLUON_STAGE_LAYERS
    # BatchNorm compute dtype. float32 is the parity default; bfloat16 lets
    # XLA fuse the scale/shift into conv epilogues without f32 round trips
    # (inference-safe: running stats are applied, not accumulated).
    norm_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        if x.shape[1] == 3:  # NCHW -> NHWC
            x = jnp.transpose(x, (0, 2, 3, 1))
        x = x.astype(self.dtype)

        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv0")(x)
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
                    name=f"stage{si + 1}_block{bi}",
                )(x, train=train)

        pooled = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # (B, 2048)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="dense0")(pooled)
        if return_features:
            return logits, pooled
        return logits


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
