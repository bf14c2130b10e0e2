"""CLIP-style text tower: label names -> embedding space.

Completes the joint visual+text feature story (BASELINE.json config 5): a
causal-masked text transformer whose projected embeddings live in the same
space as the image tower's, so label banks for the zero-shot labeler
(labels/zero_shot.py) can be built from label STRINGS — no example images
and no AWS. The reference has no text-side model at all; its only semantic
signal is the Rekognition one-hot (embeddings.go:166-174).

Weights load from a HuggingFace CLIPTextModel torch checkpoint via
:meth:`TextEncoder.from_checkpoint` / :func:`load_clip_text_torch`; the
offline default is deterministic random init + a hashing tokenizer —
structurally complete, useful for wiring and tests.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["TextConfig", "TextTransformer", "TextEncoder", "hash_tokenize",
           "load_clip_text_torch", "text_config_from_state_dict"]


@dataclass(frozen=True)
class TextConfig:
    vocab: int = 49408  # CLIP BPE vocab size
    width: int = 512
    depth: int = 12
    heads: int = 8
    proj_dim: int = 512
    context: int = 77
    quick_gelu: bool = True
    # Pooling position: None = argmax(token_ids), the CLIP-BPE convention
    # where <end> carries the highest id; set to the <end> token id when the
    # tokenizer doesn't satisfy that (the hashing tokenizer uses 2).
    eot_id: int | None = None


def hash_tokenize(text: str, vocab: int, context: int) -> np.ndarray:
    """Deterministic offline tokenizer: lowercase word pieces hashed into the
    vocab (ids 3..vocab-1); 0=<pad> 1=<start> 2=<end>. A drop-in stand-in for
    the CLIP BPE when no tokenizer file is available — stable across runs so
    banks and caches stay valid."""
    ids = [1]
    for word in text.lower().strip().split():
        h = int.from_bytes(hashlib.sha256(word.encode()).digest()[:4], "little")
        ids.append(3 + h % (vocab - 3))
        if len(ids) >= context - 1:
            break
    ids.append(2)
    out = np.zeros(context, np.int32)
    out[: len(ids)] = ids
    return out


class TextBlock(nn.Module):
    cfg: TextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                       param_dtype=jnp.float32, name=name)
        dense = lambda d, name: nn.Dense(d, dtype=self.dtype,
                                         param_dtype=jnp.float32, name=name)
        y = ln("ln1")(x).astype(self.dtype)
        b, t, _ = y.shape
        hd = c.width // c.heads
        q = dense(c.width, "q")(y).reshape(b, t, c.heads, hd)
        k = dense(c.width, "k")(y).reshape(b, t, c.heads, hd)
        v = dense(c.width, "v")(y).reshape(b, t, c.heads, hd)
        attn = jax.nn.dot_product_attention(q, k, v, mask=mask)
        x = x + dense(c.width, "proj")(attn.reshape(b, t, c.width)).astype(x.dtype)
        y = ln("ln2")(x).astype(self.dtype)
        y = dense(c.width * 4, "mlp_up")(y)
        y = y * jax.nn.sigmoid(1.702 * y) if c.quick_gelu else jax.nn.gelu(y)
        return x + dense(c.width, "mlp_down")(y).astype(x.dtype)


class TextTransformer(nn.Module):
    cfg: TextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, token_ids):
        """token_ids (B, context) int32 -> (B, proj_dim) embeddings, pooled
        at the <end> (highest-id-position) token, CLIP-style."""
        c = self.cfg
        tok = nn.Embed(c.vocab, c.width, param_dtype=jnp.float32,
                       name="token_embed")(token_ids)
        pos = self.param("pos_embed", nn.initializers.normal(0.01),
                         (1, c.context, c.width), jnp.float32)
        x = (tok + pos).astype(self.dtype)
        t = token_ids.shape[1]
        causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
        for i in range(c.depth):
            x = TextBlock(c, dtype=self.dtype, name=f"block{i}")(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="ln_final")(x)
        # pool at the <end> token position
        if c.eot_id is None:  # CLIP BPE: <end> has the highest id
            eot = jnp.argmax(token_ids, axis=1)
        else:  # explicit <end> id (hashing tokenizer: 2)
            eot = jnp.argmax((token_ids == c.eot_id).astype(jnp.int32), axis=1)
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        return nn.Dense(c.proj_dim, use_bias=False, dtype=jnp.float32,
                        param_dtype=jnp.float32,
                        name="projection")(pooled.astype(jnp.float32))


def text_config_from_state_dict(state_dict) -> TextConfig:
    """Infer the tower dims from a HuggingFace CLIPTextModel(+projection)
    state dict: vocab/width from the token embedding, context from the
    position embedding, depth by counting encoder layers, proj_dim from
    text_projection (width when absent). heads follows CLIP's width/64
    convention (the only dim a state dict cannot encode)."""
    sd = {k.replace("text_model.", ""): v for k, v in state_dict.items()}
    tok = np.asarray(sd["embeddings.token_embedding.weight"])
    pos = np.asarray(sd["embeddings.position_embedding.weight"])
    depth = 1 + max(
        int(k.split(".")[2]) for k in sd if k.startswith("encoder.layers."))
    proj = sd.get("text_projection.weight")
    vocab, width = tok.shape
    return TextConfig(
        vocab=int(vocab), width=int(width), depth=depth,
        heads=max(1, int(width) // 64),
        proj_dim=int(np.asarray(proj).shape[0]) if proj is not None
        else int(width),
        context=int(pos.shape[0]),
    )


def load_clip_text_torch(state_dict, cfg: TextConfig, variables: dict) -> dict:
    """Map a HuggingFace CLIPTextModel(+projection) torch state_dict onto
    our parameter tree — the text-side twin of
    :func:`imageclust_tpu.models.vit.load_clip_vision_torch`. Accepts
    tensors or numpy arrays; raises ValueError on any missing/mismatched
    tensor. When ``text_projection.weight`` is absent (a bare
    CLIPTextModel), the random-init projection is kept."""
    sd = {
        k.replace("text_model.", ""): np.asarray(v)
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
    put(("token_embed", "embedding"),
        sd["embeddings.token_embedding.weight"],
        ref["token_embed"]["embedding"].shape)
    put(("pos_embed",),
        sd["embeddings.position_embedding.weight"][None],
        ref["pos_embed"].shape)
    for i in range(cfg.depth):
        hf = f"encoder.layers.{i}"
        blk = f"block{i}"
        for ours, theirs in (("ln1", "layer_norm1"), ("ln2", "layer_norm2")):
            put((blk, ours, "scale"), sd[f"{hf}.{theirs}.weight"],
                ref[blk][ours]["scale"].shape)
            put((blk, ours, "bias"), sd[f"{hf}.{theirs}.bias"],
                ref[blk][ours]["bias"].shape)
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
    put(("ln_final", "scale"), sd["final_layer_norm.weight"],
        ref["ln_final"]["scale"].shape)
    put(("ln_final", "bias"), sd["final_layer_norm.bias"],
        ref["ln_final"]["bias"].shape)
    if "text_projection.weight" in sd:
        put(("projection", "kernel"), sd["text_projection.weight"].T,
            ref["projection"]["kernel"].shape)
    else:
        p["projection"] = {"kernel": ref["projection"]["kernel"]}
    return {"params": p}


class TextEncoder:
    """Batched text embedding.

    Tokenization: the real CLIP byte-level BPE when a merges file is
    available (``bpe_path`` argument, else ``IMAGECLUST_BPE_PATH`` /
    the conventional filename — models/tokenizer.py), falling back to the
    deterministic offline hashing tokenizer. With BPE, ``<|endoftext|>``
    carries the highest id, so the tower's argmax pooling convention
    (eot_id=None) applies and ids match CLIP's vocabulary — real
    CLIPTextModel checkpoints plug in via ``variables``."""

    def __init__(self, cfg: TextConfig | None = None, seed: int = 0,
                 variables: dict | None = None, bpe_path: str | None = None):
        import dataclasses
        import os

        from imageclust_tpu.models.tokenizer import (
            BPETokenizer,
            default_bpe_path,
        )

        path = bpe_path or default_bpe_path()
        self.tokenizer = None
        # Auto-adopting a conventionally-placed merges file rewires
        # vocab/eot_id; with caller-provided variables (e.g. a checkpoint
        # trained with the hash tokenizer, vocab 16384) that would break at
        # apply time with a shape mismatch — so with existing variables the
        # BPE path requires an EXPLICIT opt-in: the bpe_path argument or the
        # IMAGECLUST_BPE_PATH env var (both are deliberate user asks; only
        # the conventional-filename fallback stays variables=None-gated).
        adopt_bpe = (bpe_path is not None
                     or bool(os.environ.get("IMAGECLUST_BPE_PATH"))
                     or variables is None)
        if adopt_bpe and os.path.exists(path):
            try:
                self.tokenizer = BPETokenizer(
                    path, context=(cfg or TextConfig()).context)
            except ImportError:  # `regex` absent: degrade, don't crash
                self.tokenizer = None
        if self.tokenizer is not None:
            # full CLIP-base dims only make sense with a REAL checkpoint;
            # at random init (variables=None) keep the small offline tower
            # — 40x cheaper and no more meaningful at width 512
            base = cfg or (
                TextConfig() if variables is not None
                else TextConfig(width=256, depth=4, heads=4, proj_dim=512,
                                vocab=0))
            self.cfg = dataclasses.replace(
                base, vocab=self.tokenizer.vocab_size, eot_id=None)
        else:
            self.cfg = cfg or TextConfig(width=256, depth=4, heads=4,
                                         proj_dim=512, vocab=16384, eot_id=2)
            if self.cfg.eot_id is None:
                # hash_tokenize's <end> is 2 (not the highest id)
                self.cfg = dataclasses.replace(self.cfg, eot_id=2)
        self.model = TextTransformer(self.cfg)
        self.weights_loaded = variables is not None  # provenance (cf. verify)
        if variables is None:
            dummy = jnp.zeros((1, self.cfg.context), jnp.int32)
            variables = self.model.init(jax.random.PRNGKey(seed), dummy)
        self.variables = variables
        self._fn = jax.jit(self.model.apply)

    @classmethod
    def from_checkpoint(cls, path: str, bpe_path: str | None = None,
                        cfg: TextConfig | None = None) -> "TextEncoder":
        """Build the tower from a HuggingFace CLIPTextModel(WithProjection)
        checkpoint — torch ``.pt``/``.bin`` or an ``.npz`` export — the
        text-side twin of the registry's ``_load_vit_checkpoint``. Dims are
        inferred from the state dict (:func:`text_config_from_state_dict`)
        unless ``cfg`` overrides them. Pass the CLIP merges file as
        ``bpe_path`` so token ids match the trained embedding table; the
        hashing fallback produces ids the checkpoint never saw (warned)."""
        if path.endswith(".npz"):
            sd = dict(np.load(path))
        else:
            import torch

            sd = {
                k: v.numpy()
                for k, v in torch.load(
                    path, map_location="cpu", weights_only=True).items()
            }
        cfg = cfg or text_config_from_state_dict(sd)
        model = TextTransformer(cfg)
        dummy = jnp.zeros((1, cfg.context), jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), dummy)
        variables = load_clip_text_torch(sd, cfg, variables)
        import logging
        import os

        if bpe_path is None:
            # a real CLIP checkpoint is BPE-trained by definition, so
            # (unlike the generic __init__, which must protect
            # hash-tokenizer-trained variables) the conventionally-placed
            # merges file is adopted automatically — guarded below by the
            # vocab check against the checkpoint's own embedding table
            from imageclust_tpu.models.tokenizer import default_bpe_path

            conv = default_bpe_path()
            if os.path.exists(conv):
                bpe_path = conv
        enc = cls(cfg, variables=variables, bpe_path=bpe_path)
        log = logging.getLogger(__name__)
        if enc.tokenizer is not None and enc.cfg.vocab != cfg.vocab:
            log.warning(
                "BPE vocabulary size %d != checkpoint embedding table %d — "
                "falling back to the hashing tokenizer (wrong merges file "
                "for this checkpoint?)", enc.cfg.vocab, cfg.vocab)
            enc = cls(cfg, variables=variables)  # no BPE adoption
        if enc.tokenizer is None:
            log.warning(
                "text checkpoint %s loaded with the HASHING tokenizer — "
                "token ids will not match the trained vocabulary; pass the "
                "CLIP merges file (bpe_path / IMAGECLUST_BPE_PATH) for "
                "meaningful embeddings", path)
        return enc

    def tokenize(self, text: str) -> np.ndarray:
        if self.tokenizer is not None:
            return self.tokenizer(text)
        return hash_tokenize(text, self.cfg.vocab, self.cfg.context)

    # fixed encode batch: one compiled shape however many label names a
    # corpus produces (the unique-label set grows with the job — per-count
    # shapes would recompile every job, minutes each through the tunnel),
    # and bounded memory for huge vocabularies
    _ENCODE_BATCH = 256

    def encode(self, texts: list[str]) -> np.ndarray:
        if not texts:
            return np.zeros((0, self.cfg.proj_dim), np.float32)
        toks = np.stack([self.tokenize(t) for t in texts])
        bs = self._ENCODE_BATCH
        outs = []
        for s in range(0, len(texts), bs):
            part = toks[s:s + bs]
            c = part.shape[0]
            # pad to the next power of two: at most log2(256) compiled
            # shape classes ever, instead of one per distinct label count
            width = min(bs, 1 << max(c - 1, 1).bit_length())
            if c < width:
                part = np.concatenate(
                    [part, np.zeros((width - c, part.shape[1]), part.dtype)])
            out = np.asarray(self._fn(self.variables, jnp.asarray(part)))
            outs.append(out[:c])
        return np.concatenate(outs)
