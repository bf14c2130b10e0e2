"""Device-side image preprocessing with OpenCV-parity numerics.

The reference preprocesses one image at a time on the CPU through cgo:
IMRead (BGR) -> Resize 224x224 INTER_LINEAR -> BGR2RGB -> blob scale 1/255,
no mean/std, CHW layout (internal/embeddings/embeddings.go:46-116). Here the
whole batch is preprocessed on the TPU:

* **Resize as matmuls.** Bilinear interpolation is separable, so a resize is
  ``R @ img @ C^T`` with sparse-banded weight matrices R (out_h, in_h) and
  C (out_w, in_w) — dense matmuls that run on the MXU. The weights implement
  OpenCV's INTER_LINEAR sampling exactly: half-pixel centers
  ``src = (dst + 0.5) * scale - 0.5`` with edge clamping and NO antialiasing
  (which is why ``jax.image.resize`` — which antialiases downscales — is not
  used).
* **Fused normalize/layout.** uint8 HWC -> float32 CHW with scale/mean/std
  and optional BGR->RGB fold into the surrounding jit; a Pallas kernel
  version lives in :mod:`imageclust_tpu.ops.pallas_kernels`.

Images enter the device as uint8 (4x less PCIe/DMA traffic than float32) and
everything after the transfer is one compiled program.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resize_weights", "resize_bilinear", "preprocess_batch"]


@lru_cache(maxsize=256)
def resize_weights(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) bilinear sampling matrix, OpenCV INTER_LINEAR
    convention: src = (dst + 0.5) * (in/out) - 0.5, clamped to the edges."""
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    x0 = np.floor(src).astype(np.int64)
    frac = src - x0
    x1 = x0 + 1
    # OpenCV clamps source taps to the valid range (border replicate).
    x0c = np.clip(x0, 0, in_size - 1)
    x1c = np.clip(x1, 0, in_size - 1)
    w = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    np.add.at(w, (rows, x0c), (1.0 - frac).astype(np.float32))
    np.add.at(w, (rows, x1c), frac.astype(np.float32))
    return w


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_bilinear(images: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Resize a (B, H, W, C) batch to (B, out_h, out_w, C) with OpenCV
    INTER_LINEAR numerics. Runs as two MXU matmuls."""
    b, h, w, c = images.shape
    r = jnp.asarray(resize_weights(h, out_h))  # (out_h, h)
    cw = jnp.asarray(resize_weights(w, out_w))  # (out_w, w)
    x = images.astype(jnp.float32)
    # rows: contract H -> out_h
    x = jnp.einsum("oh,bhwc->bowc", r, x,
                   precision=jax.lax.Precision.HIGHEST)
    # cols: contract W -> out_w
    x = jnp.einsum("ow,bhwc->bhoc", cw, x,
                   precision=jax.lax.Precision.HIGHEST)
    return x


@partial(
    jax.jit,
    static_argnames=("size", "bgr_to_rgb", "channels_first"),
)
def preprocess_batch(
    images: jax.Array,
    *,
    size: int = 224,
    scale: float = 1.0 / 255.0,
    mean: tuple[float, float, float] = (0.0, 0.0, 0.0),
    std: tuple[float, float, float] = (1.0, 1.0, 1.0),
    bgr_to_rgb: bool = True,
    channels_first: bool = True,
) -> jax.Array:
    """Full device-side preprocess: uint8 (B,H,W,3) BGR -> float32 blob.

    Defaults replicate ``BlobFromImage(rgb, 1/255, (224,224), 0, false,
    false)`` applied to a BGR->RGB-converted resize (embeddings.go:69-96):
    output (B, 3, 224, 224), pixels in [0, 1], no mean/std.
    """
    x = resize_bilinear(images, size, size)
    if bgr_to_rgb:
        x = x[..., ::-1]
    mean_a = jnp.asarray(mean, jnp.float32)
    std_a = jnp.asarray(std, jnp.float32)
    x = (x * jnp.float32(scale) - mean_a) / std_a
    if channels_first:
        x = jnp.transpose(x, (0, 3, 1, 2))
    return x
