"""Local open-vocabulary labeler: zero-shot over a prototype label bank.

The reference is unusable without AWS credentials (every run calls
Rekognition, workflow.go:129). This backend labels images locally on the
TPU: cosine similarity between the image embedding and a bank of label
prototype vectors (e.g. CLIP text embeddings exported offline, or centroids
of labeled examples). Confidences are mapped to Rekognition's 0-100 scale so
the downstream thresholds (75/80, workflow.go:129 / embeddings.go:208) keep
meaning.
"""

from __future__ import annotations

import json
import os

import numpy as np

from imageclust_tpu.labels.base import Label

__all__ = ["ZeroShotLabeler"]


class ZeroShotLabeler:
    def __init__(self, names: list[str], bank: np.ndarray, embedder):
        """``bank``: (n_labels, d) prototype matrix, rows need not be
        normalized; ``embedder``: an :class:`~imageclust_tpu.models.registry.
        Embedder` whose dim matches d."""
        if bank.shape[0] != len(names):
            raise ValueError("bank rows must match names")
        norms = np.linalg.norm(bank, axis=1, keepdims=True)
        self.bank = (bank / np.maximum(norms, 1e-8)).astype(np.float32)
        self.names = names
        self.embedder = embedder

    @classmethod
    def from_texts(cls, names: list[str], embedder,
                   text_encoder=None) -> "ZeroShotLabeler":
        """Build the bank from label STRINGS via the CLIP-style text tower
        (models/text.py) — joint visual+text features with zero example
        images. Meaningful similarity requires image/text towers trained into
        the same space (load matched checkpoints); offline random init still
        produces a valid, deterministic bank for wiring."""
        if text_encoder is None:
            from imageclust_tpu.models.text import TextConfig, TextEncoder

            text_encoder = TextEncoder(
                TextConfig(width=256, depth=4, heads=4,
                           proj_dim=embedder.spec.dim, vocab=16384)
            )
        bank = text_encoder.encode([f"a photo of {n}" for n in names])
        return cls(names, bank, embedder)

    @classmethod
    def default(cls, embedder, bank_path: str | None = None,
                text_checkpoint: str | None = None) -> "ZeroShotLabeler":
        """Build the bank by priority: an explicit npz bank
        (IMAGECLUST_LABEL_BANK / ``bank_path``, from `imageclust bank`),
        else a real text tower over the builtin vocabulary when
        ``text_checkpoint`` (labels.text_checkpoint_path) is set — with
        MATCHED image/text CLIP checkpoints that makes open-vocabulary
        labels semantically live with no extra steps — else the inert
        random demo bank."""
        bank_path = bank_path or os.environ.get("IMAGECLUST_LABEL_BANK", "")
        if embedder is None:
            raise ValueError("zero_shot labeler needs an embedder")
        if not (bank_path and os.path.exists(bank_path)) and text_checkpoint:
            from imageclust_tpu.labels.fake import _VOCAB
            from imageclust_tpu.models.text import TextEncoder

            enc = TextEncoder.from_checkpoint(text_checkpoint)
            if enc.cfg.proj_dim != embedder.spec.dim:
                # cosine against image embeddings needs a shared space — a
                # CLIP text tower cannot pair with e.g. 1000-d logits. The
                # checkpoint may have been configured for the FUSION tower
                # only (labels.fusion=text shares the config field), so
                # degrade to the inert demo bank instead of aborting the
                # job — loudly.
                import logging

                logging.getLogger(__name__).warning(
                    "labels.text_checkpoint_path tower dim %d != embedder "
                    "dim %d — zero-shot needs matched image/text halves of "
                    "one CLIP model; falling back to the inert demo bank "
                    "(labels will stay empty at default thresholds)",
                    enc.cfg.proj_dim, embedder.spec.dim)
            else:
                return cls.from_texts(list(_VOCAB), embedder,
                                      text_encoder=enc)
        if bank_path and os.path.exists(bank_path):
            # allow_pickle stays False: `imageclust bank` writes plain
            # string/float arrays, and a tampered npz must not execute code.
            data = np.load(bank_path, allow_pickle=False)
            names = [str(n) for n in data["names"]]
            return cls(names, np.asarray(data["vectors"], np.float32), embedder)
        # Deterministic demo bank: stable pseudo-prototypes in embed space.
        # NOTE: random prototypes give cosines near 0 -> confidences near 50,
        # below the reference-parity default threshold (75), so labels stay
        # empty until a real bank is supplied (IMAGECLUST_LABEL_BANK npz from
        # `imageclust bank`, or matched image/text checkpoints) or the
        # threshold is lowered. That is deliberate: the demo bank must not
        # fabricate confident labels.
        rng = np.random.default_rng(7)
        from imageclust_tpu.labels.fake import _VOCAB

        bank = rng.normal(size=(len(_VOCAB), embedder.spec.dim)).astype(np.float32)
        return cls(list(_VOCAB), bank, embedder)

    def detect_labels(
        self, image_bytes: bytes, max_labels: int, min_confidence: float
    ) -> list[Label]:
        import cv2

        img = cv2.imdecode(np.frombuffer(image_bytes, np.uint8), cv2.IMREAD_COLOR)
        if img is None:
            raise ValueError("failed to decode image for zero-shot labeling")
        emb = self.embedder.embed(img[None])[0]
        return self._labels_for(emb, max_labels, min_confidence)

    def _labels_for(self, emb: np.ndarray, max_labels: int,
                    min_confidence: float) -> list[Label]:
        emb = emb / max(np.linalg.norm(emb), 1e-8)
        sims = self.bank @ emb  # cosine in [-1, 1]
        conf = (sims + 1.0) * 50.0  # -> [0, 100], Rekognition-style scale
        order = np.argsort(-conf)[: max_labels]
        return [
            Label(self.names[i], float(conf[i]))
            for i in order
            if conf[i] >= min_confidence
        ]

    def labels_from_embeddings(
        self, embeddings, max_labels: int, min_confidence: float
    ) -> list[list[Label]]:
        """Batched zero-shot: label a whole (n, d) embedding matrix at once.

        One device matmul against the bank + top-k; only the (n, k) winners
        cross to the host, so device-resident big-job embeddings stay in HBM
        (pulling an (n, d) matrix over a slow link is exactly what the
        big-job path avoids)."""
        import jax
        import jax.numpy as jnp

        k = min(max_labels, len(self.names))

        @jax.jit
        def topk(embs, bank):
            # cast INSIDE jit: bf16/int8 residency embeddings (streamed
            # big jobs) upcast tile-wise into the fused norm/matmul instead
            # of materializing an (n, d) f32 copy next to the originals
            embs = embs.astype(jnp.float32)
            norms = jnp.linalg.norm(embs, axis=1, keepdims=True)
            sims = (embs / jnp.maximum(norms, 1e-8)) @ bank.T
            conf = (sims + 1.0) * 50.0
            vals, idx = jax.lax.top_k(conf, k)
            return vals, idx

        vals, idx = topk(jnp.asarray(embeddings), jnp.asarray(self.bank))
        vals = np.asarray(vals)
        idx = np.asarray(idx)
        return [
            [Label(self.names[int(j)], float(c))
             for j, c in zip(row_idx, row_vals) if c >= min_confidence]
            for row_idx, row_vals in zip(idx, vals)
        ]
