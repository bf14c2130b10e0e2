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
