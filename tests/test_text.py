"""Text tower + joint-feature zero-shot bank tests."""

import numpy as np

from imageclust_tpu.models.text import (
    TextConfig,
    TextEncoder,
    hash_tokenize,
)


class TestTokenizer:
    def test_deterministic_and_bounded(self):
        a = hash_tokenize("Red Running Shoes", 1000, 16)
        b = hash_tokenize("Red Running Shoes", 1000, 16)
        np.testing.assert_array_equal(a, b)
        assert a[0] == 1  # <start>
        assert 2 in a  # <end>
        assert a.max() < 1000 and a.shape == (16,)

    def test_case_insensitive(self):
        np.testing.assert_array_equal(
            hash_tokenize("HELLO world", 1000, 8),
            hash_tokenize("hello WORLD", 1000, 8),
        )

    def test_truncation(self):
        t = hash_tokenize(" ".join(["w"] * 100), 1000, 8)
        assert t.shape == (8,)
        assert t[-1] == 2  # end token still present


class TestTextEncoder:
    def test_shapes_and_determinism(self):
        enc = TextEncoder(TextConfig(width=64, depth=2, heads=2,
                                     proj_dim=32, vocab=512, context=16))
        out1 = enc.encode(["shoes", "a red hat", "shoes"])
        assert out1.shape == (3, 32)
        assert np.isfinite(out1).all()
        np.testing.assert_allclose(out1[0], out1[2], atol=1e-6)
        assert not np.allclose(out1[0], out1[1])


class TestZeroShotFromTexts:
    def test_bank_from_label_strings(self, rng):
        from imageclust_tpu.labels.zero_shot import ZeroShotLabeler

        from helpers import MeanColorEmbedder, encode_png

        enc = TextEncoder(TextConfig(width=64, depth=2, heads=2,
                                     proj_dim=6, vocab=512, context=16))
        labeler = ZeroShotLabeler.from_texts(
            ["Shoes", "Hats", "Bags"], MeanColorEmbedder(), text_encoder=enc
        )
        assert labeler.bank.shape == (3, 6)
        img = encode_png(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8))
        labels = labeler.detect_labels(img, max_labels=2, min_confidence=0.0)
        assert 0 < len(labels) <= 2
        assert all(l.name in ("Shoes", "Hats", "Bags") for l in labels)


class TestTorchIngestion:
    """HF CLIPTextModel state-dict mapping (load_clip_text_torch) — the
    text-side twin of the vision round-trip in test_models.py. No real
    checkpoint exists in this image, so the state dict is synthesized FROM
    our own params with the inverse mapping: a loader bug would break the
    output-equality assertion."""

    CFG = TextConfig(vocab=96, width=32, depth=2, heads=2, proj_dim=12,
                     context=10, eot_id=2)

    def _params_to_hf(self, params):
        sd = {}
        pre = "text_model."
        sd[pre + "embeddings.token_embedding.weight"] = np.asarray(
            params["token_embed"]["embedding"])
        sd[pre + "embeddings.position_embedding.weight"] = np.asarray(
            params["pos_embed"])[0]
        for i in range(self.CFG.depth):
            blk = params[f"block{i}"]
            hf = pre + f"encoder.layers.{i}"
            for ours, theirs in (("ln1", "layer_norm1"), ("ln2", "layer_norm2")):
                sd[f"{hf}.{theirs}.weight"] = np.asarray(blk[ours]["scale"])
                sd[f"{hf}.{theirs}.bias"] = np.asarray(blk[ours]["bias"])
            for ours, theirs in (
                ("q", "self_attn.q_proj"), ("k", "self_attn.k_proj"),
                ("v", "self_attn.v_proj"), ("proj", "self_attn.out_proj"),
                ("mlp_up", "mlp.fc1"), ("mlp_down", "mlp.fc2"),
            ):
                sd[f"{hf}.{theirs}.weight"] = np.asarray(blk[ours]["kernel"]).T
                sd[f"{hf}.{theirs}.bias"] = np.asarray(blk[ours]["bias"])
        sd[pre + "final_layer_norm.weight"] = np.asarray(
            params["ln_final"]["scale"])
        sd[pre + "final_layer_norm.bias"] = np.asarray(
            params["ln_final"]["bias"])
        sd["text_projection.weight"] = np.asarray(
            params["projection"]["kernel"]).T
        return sd

    def test_state_dict_round_trip(self):
        from imageclust_tpu.models.text import (
            load_clip_text_torch,
            text_config_from_state_dict,
        )

        src = TextEncoder(self.CFG)
        sd = self._params_to_hf(src.variables["params"])

        inferred = text_config_from_state_dict(sd)
        assert (inferred.vocab, inferred.width, inferred.depth,
                inferred.context, inferred.proj_dim) == (96, 32, 2, 10, 12)

        loaded = load_clip_text_torch(sd, self.CFG, src.variables)
        dst = TextEncoder(self.CFG, variables=loaded)
        assert dst.weights_loaded and not src.weights_loaded

        texts = ["a photo of a cat", "three red shoes"]
        np.testing.assert_allclose(
            src.encode(texts), dst.encode(texts), atol=1e-5)

    def test_missing_tensor_fails_loud(self):
        from imageclust_tpu.models.text import load_clip_text_torch

        src = TextEncoder(self.CFG)
        sd = self._params_to_hf(src.variables["params"])
        del sd["text_model.final_layer_norm.weight"]
        import pytest

        with pytest.raises(KeyError):
            load_clip_text_torch(sd, self.CFG, src.variables)

    def test_from_checkpoint_npz(self, tmp_path):
        src = TextEncoder(self.CFG)
        sd = self._params_to_hf(src.variables["params"])
        path = str(tmp_path / "clip_text.npz")
        np.savez(path, **sd)

        # cfg override: the inferred heads follow CLIP's width/64 convention,
        # which this toy width can't satisfy — real checkpoints don't need it
        enc = TextEncoder.from_checkpoint(path, cfg=self.CFG)
        assert enc.weights_loaded
        out = enc.encode(["a photo of a dog"])
        assert out.shape == (1, 12) and np.isfinite(out).all()
        # hashing-tokenizer ids agree with src's (same cfg), so outputs match
        np.testing.assert_allclose(
            out, src.encode(["a photo of a dog"]), atol=1e-5)

        # dim inference alone still yields a working (if 1-headed) tower
        enc2 = TextEncoder.from_checkpoint(path)
        assert enc2.cfg.width == 32 and enc2.cfg.heads == 1
        assert np.isfinite(enc2.encode(["x"])).all()
