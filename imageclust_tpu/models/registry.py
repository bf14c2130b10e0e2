"""Pluggable embedder registry and the batched, sharded embed executor.

The reference hardwires one embedder and runs it one image at a time behind a
mutex (internal/embeddings/embeddings.go:119-163 — ``NetMutex`` serializes
every forward pass). Here embedding is the TPU hot loop done right: images
arrive as one uint8 batch, preprocessing + forward run as a single jitted
program per batch shape, and with a mesh the batch is sharded over the
``data`` axis (parameters replicated) so throughput scales linearly with
chips — XLA inserts the collectives.

Models: ``resnet50`` (parity with resnet50-v1-7.onnx: the 1000-d logits the
reference calls an embedding, embeddings.go:140, or 2048-d pooled features),
``vit_b32`` / ``vit_b16`` / ``vit_l14`` / ``vit_l14_336`` / ``siglip_so400m``
(BASELINE.json configs 2-5).
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from imageclust_tpu.config import EmbedConfig, PreprocessConfig
from imageclust_tpu.ops.preprocess import preprocess_batch

log = logging.getLogger(__name__)

__all__ = ["EmbedderSpec", "Embedder", "create_embedder", "list_models"]

# Measured-best batch per tower on one v5e chip (BASELINE.md tower table).
# Used when EmbedConfig.batch_size is 0 ("auto"). ViT-B/32's short 50-token
# sequences leave lane slack that batch 1024 partly recovers (+6-9% over
# 512: 8,074 vs 7,436 img/s); the big towers are at their ceiling at the
# batch where activation memory still fits comfortably.
DEFAULT_BATCH = {
    "resnet50": 512,
    "vit_b32": 1024,
    "vit_b16": 256,
    "vit_l14": 128,
    "vit_l14_336": 64,
    "siglip_so400m": 128,
}


@dataclass(frozen=True)
class EmbedderSpec:
    name: str
    input_size: int
    dim: int
    scale: float
    mean: tuple[float, float, float]
    std: tuple[float, float, float]
    # reference keeps BGR->RGB conversion before the blob (embeddings.go:82)
    bgr_input: bool


def list_models() -> list[str]:
    from imageclust_tpu.models.vit import VIT_CONFIGS

    return ["resnet50", *VIT_CONFIGS.keys()]


class Embedder:
    """Batched embedding executor with optional data-parallel sharding."""

    def __init__(
        self,
        spec: EmbedderSpec,
        apply_fn: Callable[[dict, jax.Array], jax.Array],
        variables: dict,
        batch_size: int = 256,
        mesh: Mesh | None = None,
        tag: str = "",
        raw_apply_fn: Callable[[dict, jax.Array], jax.Array] | None = None,
        weights_loaded: bool = False,
    ):
        self.spec = spec
        self.batch_size = batch_size
        self.mesh = mesh
        # multi-process mesh (a real pod, or the local gloo bring-up):
        # host arrays cannot be device_put onto non-addressable devices —
        # every put below switches to make_array_from_callback, building
        # the global array from the full host copy each process holds
        self._multiproc = mesh is not None and any(
            d.process_index != jax.process_index()
            for d in mesh.devices.flat
        )
        if mesh is not None:
            # the DP executor dispatches device-divisible batches; rounding
            # DOWN inside embed_stream* while producers chunk at the raw
            # batch_size would reject their chunks — make the effective
            # size the one everyone sees
            ndev = mesh.shape["data"]
            self.batch_size = max(ndev, (batch_size // ndev) * ndev)
        self.tag = tag or spec.name  # identity for the embedding cache
        # provenance: True iff real weights (ONNX/ckpt) were ingested —
        # verify gates must not certify random init (review finding)
        self.weights_loaded = weights_loaded
        self._apply_fn = apply_fn
        # fast path taking RAW uint8 NHWC at input_size (normalization and
        # layout folded into the model, e.g. the ResNet s2d stem)
        self._raw_apply_fn = raw_apply_fn
        if mesh is not None:
            repl = NamedSharding(mesh, P())
            if self._multiproc:
                variables = jax.tree.map(
                    lambda x: self._globalize(np.asarray(x), repl), variables)
            else:
                variables = jax.device_put(variables, repl)
        self.variables = variables
        self._jitted: dict[tuple, Any] = {}

    @staticmethod
    def _globalize(host: np.ndarray, sharding):
        """Host array -> global jax.Array on a (possibly multi-process)
        mesh. Every process holds the same full host value and donates its
        addressable shards — the multi-process form of device_put."""
        return jax.make_array_from_callback(
            host.shape, sharding, lambda idx: host[idx])

    def _device_batch(self, chunk: np.ndarray):
        """One padded uint8 batch -> the array the jitted embed fn takes:
        plain transfer single-process, a global P('data') array when the
        mesh spans processes (batch sizes are ndev-divisible by
        construction, so the row shards are even)."""
        if self._multiproc:
            host = np.ascontiguousarray(chunk)
            return self._globalize(
                host, NamedSharding(self.mesh, P("data")))
        return jnp.asarray(chunk)

    # -- compiled kernels ---------------------------------------------------

    def _embed_fn(self, resize: bool):
        key = ("embed", resize)
        if key in self._jitted:
            return self._jitted[key]
        spec = self.spec

        def fn(variables, images_u8):
            # NHWC end to end: the towers are NHWC-native internally, so
            # emitting CHW here would just add two full-batch layout passes
            if not resize and self._raw_apply_fn is not None:
                return self._raw_apply_fn(variables, images_u8)
            if resize:
                x = preprocess_batch(
                    images_u8,
                    size=spec.input_size,
                    scale=spec.scale,
                    mean=spec.mean,
                    std=spec.std,
                    bgr_to_rgb=spec.bgr_input,
                    channels_first=False,
                )
            else:
                x = images_u8.astype(jnp.float32)
                if spec.bgr_input:
                    x = x[..., ::-1]
                mean = jnp.asarray(spec.mean, jnp.float32)
                std = jnp.asarray(spec.std, jnp.float32)
                x = (x * jnp.float32(spec.scale) - mean) / std
            return self._apply_fn(variables, x)

        if self.mesh is not None:
            fn = jax.jit(
                fn,
                in_shardings=(
                    NamedSharding(self.mesh, P()),
                    NamedSharding(self.mesh, P("data")),
                ),
                out_shardings=NamedSharding(self.mesh, P("data")),
            )
        else:
            fn = jax.jit(fn)
        self._jitted[key] = fn
        return fn

    # -- public API ----------------------------------------------------------

    def _embed_chunks(self, images: np.ndarray) -> list[jax.Array]:
        images = np.asarray(images)
        if images.ndim != 4 or images.shape[-1] != 3:
            raise ValueError(f"expected (N,H,W,3), got {images.shape}")
        n = images.shape[0]
        resize = images.shape[1:3] != (self.spec.input_size, self.spec.input_size)
        fn = self._embed_fn(resize)

        # compile for the smallest power-of-two batch that covers the job
        # (capped at batch_size) so a 12-image request doesn't pay the
        # full-batch XLA compile.
        bs = min(self.batch_size, max(8, 1 << (n - 1).bit_length()))
        if self.mesh is not None:
            ndev = self.mesh.shape["data"]
            bs = max(ndev, (bs // ndev) * ndev)
        chunks = []
        for start in range(0, n, bs):
            chunk = images[start:start + bs]
            c = chunk.shape[0]
            if c < bs:  # pad the tail to the compiled batch shape
                pad = np.zeros((bs - c, *chunk.shape[1:]), chunk.dtype)
                chunk = np.concatenate([chunk, pad])
            emb = fn(self.variables, self._device_batch(chunk))
            chunks.append(emb[:c] if c < bs else emb)
        return chunks

    def embed(self, images: np.ndarray) -> np.ndarray:
        """Embed a uint8 (N, H, W, 3) batch (BGR if spec.bgr_input, matching
        the reference's IMRead color order). Images already at input_size skip
        the device resize. Returns float32 (N, dim) on the host."""
        chunks = self._embed_chunks(images)
        n = sum(c.shape[0] for c in chunks)
        out = np.empty((n, self.spec.dim), np.float32)
        start = 0
        for c in chunks:
            out[start:start + c.shape[0]] = np.asarray(c)
            start += c.shape[0]
        return out

    def embed_device(self, images: np.ndarray) -> jax.Array:
        """Like :meth:`embed` but the result STAYS IN HBM — feed it straight
        into the device-resident clustering path without a host round trip."""
        return jnp.concatenate(self._embed_chunks(images))

    def embed_stream(self, chunks, inflight: int = 4,
                     total: int | None = None) -> jax.Array:
        """Embed an iterable of uint8 (b, S, S, 3) chunks (S = input size,
        b <= batch_size) and return float32 (N, dim) RESIDENT IN HBM.

        Each chunk is padded to one compiled batch shape and dispatched
        asynchronously, so while the device runs chunk k the producer (e.g.
        :func:`imageclust_tpu.data.loader.stream_decode`) decodes chunk k+1 —
        the double-buffered ingest the all-at-once path can't do, with RSS
        bounded by the producer's prefetch depth instead of the job size.

        ``inflight`` caps the number of un-synced dispatches: without it,
        async dispatch lets the host queue transfer staging buffers faster
        than a slow host->device link drains them and RSS grows with the
        job (observed: 16 GB at 100k images through the axon tunnel). Every
        ``inflight`` chunks one scalar probe is pulled from the chunk one
        window BACK (lagged fence — bounds in-flight work at <= 2*inflight
        chunks without parking the device for the probe's round trip)."""
        return self.embed_stream_quantized(chunks, inflight, total=total)[0]

    def embed_stream_quantized(self, chunks, inflight: int = 4,
                               out_dtype=None, margin: float = 1.25,
                               total: int | None = None):
        """:meth:`embed_stream` with each chunk cast to a RESIDENCY dtype
        before it accumulates in HBM — the f32 matrix never exists, so the
        bf16/int8 cluster capacity tiers are reachable through the real
        streamed pipeline, not just synthetic benches. (This method IS the
        stream loop; ``embed_stream`` is the identity-cast special case.)

        ``out_dtype`` None/float32: identity. bfloat16: plain per-chunk
        rounding. int8: symmetric grid with the scale calibrated on the
        FIRST chunk (absmax * ``margin`` / 127; embeddings from one model
        are range-stable across chunks — later outliers clip, same
        compromise as int8 activation calibration). Returns
        ``(array, scale)``; ``scale`` is 1.0 unless int8 — divide any
        block concatenated onto these features (e.g. label fusion) by it
        so relative geometry matches the f32 pipeline.

        Chunks may be DEVICE arrays (e.g. on-device synthetic ingest for
        tier-scale benchmarks): they feed the forward pass directly with no
        host round trip through the ~20 MB/s tunnel.

        ``total``: when the job size is known up front and the stream is
        single-process, embeddings accumulate into ONE preallocated
        (total, dim) buffer via donated ``dynamic_update_slice`` — the
        final ``concatenate`` of the list path needs 2x the feature bytes
        live at once, which does not exist at the 10M tier (10+ GB matrix
        on a 16 GB chip). The list path (exact same values) remains the
        default for unsized streams."""
        import jax
        import jax.numpy as jnp

        int8 = out_dtype == jnp.int8
        if out_dtype is None or out_dtype == jnp.float32:
            out_dtype = jnp.float32
            cast = lambda e, _: e
        elif out_dtype == jnp.bfloat16:
            cast = lambda e, _: e.astype(jnp.bfloat16)
        elif int8:
            @jax.jit
            def cast(e, s):
                q = jnp.round(e.astype(jnp.float32) / s)
                return jnp.clip(q, -127, 127).astype(jnp.int8)
        else:
            raise ValueError(f"unsupported residency dtype {out_dtype}")

        fn = self._embed_fn(resize=False)
        bs = self.batch_size
        if self.mesh is not None:
            ndev = self.mesh.shape["data"]
            bs = max(ndev, (bs // ndev) * ndev)
        # multi-process donation across global arrays is untested here —
        # the tier-scale preallocated path is single-chip scope for now
        prealloc = total is not None and not self._multiproc
        buf = None
        fill = None
        if prealloc:
            buf = jnp.zeros((total, self.spec.dim), out_dtype)

            @partial(jax.jit, donate_argnums=0)
            def fill(b, rows, start):
                return jax.lax.dynamic_update_slice(b, rows, (start, 0))

        outs: list[jax.Array] = []
        scale = 1.0
        written = 0
        n_chunks = 0
        # The in-flight bound is LAGGED one window: syncing on the chunk
        # just dispatched parks the device for a full tunnel RTT (~50 ms)
        # per sync while the probe scalar crosses; syncing on the PREVIOUS
        # window's chunk (already long done) keeps the dispatch queue full
        # while still bounding un-synced work to <= 2*inflight chunks.
        fence = None
        expect = (self.spec.input_size, self.spec.input_size, 3)
        for chunk in chunks:
            on_device = isinstance(chunk, jax.Array)
            if not on_device:
                chunk = np.asarray(chunk)
            if chunk.shape[1:] != expect or chunk.shape[0] > bs:
                raise ValueError(
                    f"stream chunk must be (<= {bs}, {expect}), "
                    f"got {chunk.shape}")
            c = chunk.shape[0]
            if c < bs:  # pad to the one compiled shape
                if on_device:
                    chunk = jnp.pad(chunk, ((0, bs - c), (0, 0), (0, 0),
                                            (0, 0)))
                else:
                    pad = np.zeros((bs - c, *chunk.shape[1:]), chunk.dtype)
                    chunk = np.concatenate([chunk, pad])
            emb = fn(self.variables,
                     chunk if on_device else self._device_batch(chunk))
            emb = emb[:c] if c < bs else emb
            if n_chunks == 0 and int8:
                # one host sync, first chunk only: the grid scale
                # (jnp.max of a global array is fully replicated, so
                # float() works across processes too)
                scale = max(
                    float(jnp.max(jnp.abs(emb))) * margin / 127.0, 1e-30)
            emb = cast(emb, jnp.float32(scale))
            n_chunks += 1
            if prealloc:
                if written + emb.shape[0] > total:
                    raise ValueError(
                        f"stream yielded more than total={total} rows")
                buf = fill(buf, emb, jnp.int32(written))
                written += emb.shape[0]
                if inflight and n_chunks % inflight == 0:
                    if fence is not None:
                        np.asarray(fence[:1, :1])  # bound in-flight work
                    fence = emb  # NOT donated by fill — safe to probe later
                continue
            outs.append(emb)
            if inflight and len(outs) % inflight == 0:
                if self._multiproc:  # global slices may not be addressable
                    outs[-1].block_until_ready()
                else:
                    if fence is not None:
                        np.asarray(fence[:1, :1])  # bound in-flight transfers
                    fence = emb
        if prealloc:
            if written != total:
                raise ValueError(
                    f"stream yielded {written} rows, expected total={total}")
            return buf, scale
        if not outs:
            return jnp.zeros((0, self.spec.dim), out_dtype), scale
        return (outs[0] if len(outs) == 1 else jnp.concatenate(outs)), scale

    def embed_blob(self, blob: np.ndarray) -> np.ndarray:
        """Embed an already-preprocessed float32 (N, 3, S, S) blob — the
        exact tensor the reference feeds its DNN (embeddings.go:103)."""
        fn_key = ("blob",)
        if fn_key not in self._jitted:
            f = jax.jit(self._apply_fn)
            self._jitted[fn_key] = f
        return np.asarray(self._jitted[fn_key](self.variables, jnp.asarray(blob)))


def _calib_batch(size: int, weights_loaded: bool) -> np.ndarray:
    """int8 calibration batch: the IMAGECLUST_CALIB_NPY uint8 sample when
    set, else synthetic uniform noise — with no pretrained weights in this
    environment the activations are random-init statistics either way.
    Production: point IMAGECLUST_CALIB_NPY at a (B, size, size, 3) uint8
    BGR sample of the corpus (warned when real weights calibrate on
    noise)."""
    calib_path = os.environ.get("IMAGECLUST_CALIB_NPY", "")
    if calib_path and os.path.exists(calib_path):
        return np.load(calib_path)[:32]
    if weights_loaded:
        log.warning(
            "int8 calibration is running on SYNTHETIC uniform-noise images "
            "against real (non-random-init) weights — the activation scales "
            "will not reflect real data and may clip; set "
            "IMAGECLUST_CALIB_NPY to a (B,%d,%d,3) uint8 sample of your "
            "corpus", size, size,
        )
    return np.random.default_rng(0).integers(
        0, 256, (8, size, size, 3), np.uint8)


def _build_resnet50(cfg: EmbedConfig, rng_seed: int = 0):
    from imageclust_tpu.models.resnet50 import ResNet50V1, load_onnx_params

    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    norm_dtype = jnp.bfloat16 if cfg.norm_dtype == "bfloat16" else jnp.float32
    model = ResNet50V1(dtype=dtype, norm_dtype=norm_dtype,
                       num_classes=cfg.num_classes)
    rng = jax.random.PRNGKey(rng_seed)
    dummy = jnp.zeros((1, 3, 224, 224), jnp.float32)
    variables = model.init(rng, dummy)
    weights_loaded = True
    if cfg.checkpoint_path and os.path.exists(cfg.checkpoint_path):
        from imageclust_tpu.utils.checkpoint import restore_variables

        variables = restore_variables(cfg.checkpoint_path, dict(variables))
        log.info("restored checkpoint %s", cfg.checkpoint_path)
    elif cfg.onnx_path and os.path.exists(cfg.onnx_path):
        variables = load_onnx_params(cfg.onnx_path, dict(variables))
        log.info("loaded ONNX weights from %s", cfg.onnx_path)
    else:
        weights_loaded = False
        log.warning(
            "ONNX checkpoint %s not found — using random init "
            "(the reference mirror strips the blob, .MISSING_LARGE_BLOBS:1)",
            cfg.onnx_path,
        )

    pooled = cfg.output == "pooled"

    if cfg.quantize == "int8":
        from imageclust_tpu.models.quantize import (
            quant_apply,
            quantize_resnet50,
        )

        # reference preprocessing: raw 1/255 pixels, no mean/std
        calib = _calib_batch(224, weights_loaded).astype(
            np.float32)[..., ::-1] / 255.0  # BGR->RGB
        qparams = quantize_resnet50(variables, calib,
                                    calib_method=cfg.calib_method)

        def q_apply_fn(vars_, x):
            logits, feats = quant_apply(vars_, x)
            return feats if pooled else logits

        # raw uint8 fast path: quant_apply dispatches on dtype to the fused
        # s2d stem (same kernel rewrite as the bf16 tower's s2d_raw mode)
        q_raw_apply_fn = q_apply_fn if cfg.s2d_stem else None

        spec = EmbedderSpec(
            name="resnet50",
            input_size=224,
            dim=2048 if pooled else cfg.num_classes,
            scale=1.0 / 255.0,
            mean=(0.0, 0.0, 0.0),
            std=(1.0, 1.0, 1.0),
            bgr_input=True,
        )
        return spec, q_apply_fn, qparams, q_raw_apply_fn, weights_loaded

    def apply_fn(vars_, x):
        logits, feats = model.apply(vars_, x, return_features=True)
        return feats if pooled else logits

    raw_apply_fn = None
    if cfg.s2d_stem:
        # same variables, faster stem: raw uint8 in, s2d + folded scale/flip
        raw_model = ResNet50V1(dtype=dtype, norm_dtype=norm_dtype,
                               num_classes=cfg.num_classes,
                               stem_mode="s2d_raw")

        def raw_apply_fn(vars_, u8):
            logits, feats = raw_model.apply(vars_, u8, return_features=True)
            return feats if pooled else logits

    spec = EmbedderSpec(
        name="resnet50",
        input_size=224,
        dim=2048 if pooled else cfg.num_classes,
        scale=1.0 / 255.0,  # embeddings.go:96 — no mean/std
        mean=(0.0, 0.0, 0.0),
        std=(1.0, 1.0, 1.0),
        bgr_input=True,
    )
    return spec, apply_fn, variables, raw_apply_fn, weights_loaded


def _build_vit(name: str, cfg: EmbedConfig, rng_seed: int = 0):
    from imageclust_tpu.models.vit import VIT_CONFIGS, VisionTransformer

    vcfg = VIT_CONFIGS[name]
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    norm_dtype = jnp.bfloat16 if cfg.norm_dtype == "bfloat16" else jnp.float32
    model = VisionTransformer(vcfg, dtype=dtype, norm_dtype=norm_dtype)
    rng = jax.random.PRNGKey(rng_seed)
    dummy = jnp.zeros((1, 3, vcfg.image_size, vcfg.image_size), jnp.float32)
    variables = model.init(rng, dummy)
    ckpt = cfg.onnx_path
    weights_loaded = False
    if ckpt and os.path.exists(ckpt) and ckpt.endswith((".pt", ".bin", ".safetensors", ".npz")):
        variables = _load_vit_checkpoint(ckpt, vcfg, dict(variables))
        weights_loaded = True
    elif ckpt and not ckpt.endswith(".onnx"):
        # .onnx is the config's resnet-oriented default — silently skipping
        # it for a ViT tower is intended; any OTHER unloadable path was an
        # explicit ask, so say loudly that random init is being used
        log.warning(
            "ViT checkpoint %s not loaded (%s) — using random init",
            ckpt,
            "file missing" if not os.path.exists(ckpt)
            else "unsupported extension; want .pt/.bin/.safetensors/.npz",
        )

    def apply_fn(vars_, x):
        return model.apply(vars_, x)

    spec = EmbedderSpec(
        name=name,
        input_size=vcfg.image_size,
        dim=vcfg.proj_dim,
        scale=1.0 / 255.0,
        mean=vcfg.mean,
        std=vcfg.std,
        bgr_input=True,
    )

    if cfg.quantize == "int8":
        from imageclust_tpu.models.quantize_vit import (
            quantize_vit,
            vit_quant_apply,
        )

        # same normalization _embed_fn applies before the tower
        calib = _calib_batch(vcfg.image_size, weights_loaded).astype(
            np.float32)[..., ::-1] / 255.0  # BGR->RGB
        calib = ((calib - np.asarray(vcfg.mean, np.float32))
                 / np.asarray(vcfg.std, np.float32))
        qparams = quantize_vit(variables, vcfg, calib,
                               calib_method=cfg.calib_method)

        def q_apply_fn(vars_, x):
            return vit_quant_apply(vars_, x, vcfg)

        return spec, q_apply_fn, qparams, weights_loaded

    return spec, apply_fn, variables, weights_loaded


def _load_vit_checkpoint(path: str, vcfg, variables: dict) -> dict:
    from imageclust_tpu.models.vit import load_clip_vision_torch

    if path.endswith(".npz"):
        sd = dict(np.load(path))
    else:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        sd = {k: v.numpy() for k, v in sd.items()}
    loaded = load_clip_vision_torch(sd, vcfg, variables)
    return {**variables, **loaded}


def _weights_tag(cfg: EmbedConfig, seed: int) -> str:
    """Embedder identity for the content-addressed embedding cache: model
    name + a fingerprint of the weights' provenance."""
    import hashlib

    # quantized towers produce different embeddings than full precision —
    # the cache identity must separate them (and the calibration statistic
    # changes the activation scales, i.e. the embeddings)
    q = f":{cfg.quantize}-{cfg.calib_method}" if cfg.quantize else ""
    if cfg.checkpoint_path and os.path.exists(cfg.checkpoint_path):
        st = os.stat(cfg.checkpoint_path)
        fp = hashlib.sha256(
            f"{cfg.checkpoint_path}:{st.st_size}:{int(st.st_mtime)}".encode()
        ).hexdigest()[:12]
        return f"{cfg.model}:{cfg.output}{q}:ckpt-{fp}"
    if cfg.onnx_path and os.path.exists(cfg.onnx_path):
        h = hashlib.sha256()
        with open(cfg.onnx_path, "rb") as fh:
            h.update(fh.read(1 << 20))
        st = os.stat(cfg.onnx_path)
        h.update(str((st.st_size, int(st.st_mtime))).encode())
        return f"{cfg.model}:{cfg.output}{q}:{h.hexdigest()[:12]}"
    return f"{cfg.model}:{cfg.output}{q}:randominit-{seed}"


def create_embedder(
    cfg: EmbedConfig | None = None,
    mesh: Mesh | None = None,
    seed: int = 0,
) -> Embedder:
    cfg = cfg or EmbedConfig()
    if cfg.quantize not in ("", "int8"):
        raise ValueError(f"unknown quantize mode {cfg.quantize!r}")
    raw_apply_fn = None
    if cfg.model == "resnet50":
        spec, apply_fn, variables, raw_apply_fn, loaded = _build_resnet50(
            cfg, seed)
    elif cfg.model in list_models():
        spec, apply_fn, variables, loaded = _build_vit(cfg.model, cfg, seed)
    else:
        raise ValueError(f"unknown model {cfg.model!r}; know {list_models()}")
    batch = cfg.batch_size or DEFAULT_BATCH.get(cfg.model, 256)
    return Embedder(spec, apply_fn, variables, batch, mesh,
                    tag=_weights_tag(cfg, seed), raw_apply_fn=raw_apply_fn,
                    weights_loaded=loaded)
