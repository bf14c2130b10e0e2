"""Preprocessing numerics parity vs OpenCV (SURVEY.md §4 item 1).

cv2 here is the *same* library the reference reaches through gocv
(internal/embeddings/embeddings.go:46-116), so these tests pin our
matmul-resize to the reference's exact sampling semantics.
"""

import cv2
import numpy as np
import pytest

from imageclust_tpu.ops.preprocess import (
    preprocess_batch,
    resize_bilinear,
    resize_weights,
)


class TestResizeWeights:
    def test_rows_sum_to_one(self):
        for insz, outsz in [(1000, 224), (100, 224), (224, 224), (7, 3)]:
            w = resize_weights(insz, outsz)
            np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-6)

    def test_identity(self):
        w = resize_weights(64, 64)
        np.testing.assert_allclose(w, np.eye(64, dtype=np.float32), atol=1e-7)


class TestOpenCVParity:
    @pytest.mark.parametrize("hw", [(480, 640), (100, 100), (37, 53), (1024, 768)])
    def test_float_resize_matches_cv2(self, rng, hw):
        # float input -> cv2 uses true float bilinear; should match tightly.
        h, w = hw
        img = rng.random((h, w, 3)).astype(np.float32)
        want = cv2.resize(img, (224, 224), interpolation=cv2.INTER_LINEAR)
        got = np.asarray(resize_bilinear(img[None], 224, 224))[0]
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    @pytest.mark.parametrize("hw", [(480, 640), (300, 200)])
    def test_uint8_resize_close_to_cv2(self, rng, hw):
        # cv2's 8-bit path uses 11-bit fixed-point coefficients; allow ~1 LSB.
        h, w = hw
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        want = cv2.resize(img, (224, 224), interpolation=cv2.INTER_LINEAR)
        got = np.asarray(resize_bilinear(img[None], 224, 224))[0]
        assert np.abs(got - want.astype(np.float32)).max() <= 1.5

    def test_upscale_matches_cv2(self, rng):
        img = rng.random((64, 48, 3)).astype(np.float32)
        want = cv2.resize(img, (224, 224), interpolation=cv2.INTER_LINEAR)
        got = np.asarray(resize_bilinear(img[None], 224, 224))[0]
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


class TestBlobParity:
    def test_blob_semantics(self, rng):
        """Full parity with PreprocessImage (embeddings.go:46-116):
        BGR read -> resize 224 -> BGR2RGB -> *1/255 -> (1,3,224,224)."""
        bgr = rng.integers(0, 256, size=(480, 640, 3), dtype=np.uint8)

        # reference pipeline via cv2 (what gocv executes)
        resized = cv2.resize(bgr, (224, 224), interpolation=cv2.INTER_LINEAR)
        rgb = cv2.cvtColor(resized, cv2.COLOR_BGR2RGB)
        want = cv2.dnn.blobFromImage(
            rgb, scalefactor=1.0 / 255.0, size=(224, 224),
            mean=(0, 0, 0), swapRB=False, crop=False,
        )  # (1, 3, 224, 224)

        got = np.asarray(preprocess_batch(bgr[None]))
        assert got.shape == (1, 3, 224, 224)
        assert np.abs(got - want).max() <= 1.5 / 255.0

    def test_batch_independence(self, rng):
        imgs = rng.integers(0, 256, size=(4, 100, 120, 3), dtype=np.uint8)
        full = np.asarray(preprocess_batch(imgs))
        single = np.asarray(preprocess_batch(imgs[2:3]))
        np.testing.assert_allclose(full[2:3], single, atol=1e-6)

    def test_mean_std_and_layout_options(self, rng):
        img = rng.integers(0, 256, size=(1, 64, 64, 3), dtype=np.uint8)
        out = np.asarray(
            preprocess_batch(
                img, size=32, scale=1.0, mean=(10.0, 20.0, 30.0),
                std=(2.0, 4.0, 8.0), bgr_to_rgb=False, channels_first=False,
            )
        )
        assert out.shape == (1, 32, 32, 3)
        raw = np.asarray(resize_bilinear(img, 32, 32))
        want = (raw - np.array([10.0, 20.0, 30.0])) / np.array([2.0, 4.0, 8.0])
        np.testing.assert_allclose(out, want, atol=1e-5)

    def test_value_range(self, rng):
        img = rng.integers(0, 256, size=(2, 50, 50, 3), dtype=np.uint8)
        out = np.asarray(preprocess_batch(img))
        assert out.min() >= 0.0 and out.max() <= 1.0
