"""Dense text-label fusion (labels.fusion="text", labels/text_fusion.py) —
BASELINE config 5's joint visual+text feature formulation. The one-hot path
(embeddings.go:166-183) stays the parity default; these tests pin the dense
block's math and the pipeline wiring around it."""

import numpy as np
import pytest

from imageclust_tpu.config import AppConfig, LabelConfig, NamingConfig
from imageclust_tpu.labels.base import Label
from imageclust_tpu.labels.text_fusion import (
    confidence_weights,
    label_text_bank,
    text_label_matrix,
)
from imageclust_tpu.pipeline import Pipeline
from imageclust_tpu.types import UploadedImage

from helpers import MeanColorEmbedder, color_group_images


class FixedEncoder:
    """Deterministic stand-in for models.text.TextEncoder: each text maps to
    a fixed random vector (keyed by the string), so tests can assert exact
    mixing arithmetic without a transformer forward."""

    def __init__(self, dim=8):
        self.dim = dim

    def encode(self, texts):
        out = np.zeros((len(texts), self.dim), np.float32)
        for i, t in enumerate(texts):
            rng = np.random.default_rng(abs(hash(t)) % (2**32))
            out[i] = rng.normal(size=self.dim)
        return out


def _norm(v):
    return v / np.linalg.norm(v)


class TestBank:
    def test_rows_follow_label_set_index_order(self):
        enc = FixedEncoder()
        label_set = {"cat": 0, "dog": 1, "car": 2}
        bank = label_text_bank(label_set, enc)
        assert bank.shape == (3, 8)
        want_cat = _norm(enc.encode(["a photo of cat"])[0])
        np.testing.assert_allclose(bank[0], want_cat, rtol=1e-6)
        # unit rows
        np.testing.assert_allclose(
            np.linalg.norm(bank, axis=1), np.ones(3), rtol=1e-6)

    def test_empty_label_set(self):
        assert label_text_bank({}, FixedEncoder()).size == 0


class TestWeights:
    def test_confidence_weighted_rows_sum_to_one(self):
        label_set = {"a": 0, "b": 1}
        per_image = [
            [Label("a", 90.0), Label("b", 10.0)],
            [Label("b", 50.0)],
            [],  # unlabeled -> zero row
            [Label("zzz", 99.0)],  # unknown label ignored (parity)
        ]
        w = confidence_weights(per_image, label_set)
        np.testing.assert_allclose(w[0], [0.9, 0.1], rtol=1e-6)
        np.testing.assert_allclose(w[1], [0.0, 1.0], rtol=1e-6)
        assert not w[2].any() and not w[3].any()


class TestMatrix:
    def test_weighted_mean_then_l2(self):
        enc = FixedEncoder()
        label_set = {"a": 0, "b": 1}
        per_image = [[Label("a", 75.0), Label("b", 25.0)], []]
        mat = text_label_matrix(per_image, label_set, enc)
        bank = label_text_bank(label_set, enc)
        want = _norm(0.75 * bank[0] + 0.25 * bank[1])
        np.testing.assert_allclose(mat[0], want, rtol=1e-5)
        assert not mat[1].any()  # unlabeled rows stay zero

    def test_fixed_width_regardless_of_vocab(self):
        enc = FixedEncoder(dim=8)
        for n_labels in (1, 5, 40):
            label_set = {f"l{i}": i for i in range(n_labels)}
            per_image = [[Label("l0", 80.0)]]
            assert text_label_matrix(per_image, label_set, enc).shape == (1, 8)


class TestPipelineWiring:
    def _pipe(self, fusion, **label_kw):
        cfg = AppConfig(
            labels=LabelConfig(backend="fake", fusion=fusion, **label_kw),
            naming=NamingConfig(services=("fake",), retries=1),
        )
        return Pipeline(cfg, embedder=MeanColorEmbedder())

    def test_text_fusion_end_to_end(self, rng, tmp_path):
        names, blobs = color_group_images(rng, n_groups=3, per_group=4)
        uploads = [UploadedImage(n, b) for n, b in zip(names, blobs)]
        pipe = self._pipe("text")
        result = pipe.run(uploads, str(tmp_path), min_size=3, max_size=6)
        got = {frozenset(d.images) for d in result.clusters.values()}
        want = {
            frozenset(f"g{g}_img{i}.png" for i in range(4)) for g in range(3)
        }
        assert got == want  # color groups still recovered with dense labels
        # one text tower per pipeline, built lazily
        assert pipe._text_encoder is not None

    def test_onehot_default_never_builds_text_tower(self, rng, tmp_path):
        names, blobs = color_group_images(rng, n_groups=2, per_group=3)
        uploads = [UploadedImage(n, b) for n, b in zip(names, blobs)]
        pipe = self._pipe("onehot")
        pipe.run(uploads, str(tmp_path), min_size=3, max_size=6)
        assert pipe._text_encoder is None

    def test_unknown_fusion_fails_loud(self, rng, tmp_path):
        names, blobs = color_group_images(rng, n_groups=2, per_group=3)
        uploads = [UploadedImage(n, b) for n, b in zip(names, blobs)]
        pipe = self._pipe("tect")
        with pytest.raises(ValueError, match="labels.fusion"):
            pipe.run(uploads, str(tmp_path), min_size=3, max_size=6)
