"""Host ingest tests: decode/resize, sanitization (utils.go:240-250)."""

import numpy as np
import pytest

from imageclust_tpu.data.loader import (
    DecodeError,
    decode_images,
    load_image_dir,
    sanitize_filename,
)

from helpers import encode_png


class TestSanitize:
    def test_allowlist(self):
        # utils.go:240-250: keep [a-zA-Z0-9.-], else '_'
        assert sanitize_filename("photo-1.jpg") == "photo-1.jpg"
        assert sanitize_filename("../../etc/passwd") == ".._.._etc_passwd"
        assert sanitize_filename("a b/c\\d:e*f.png") == "a_b_c_d_e_f.png"
        assert sanitize_filename("ünïcode.jpg") == "_n_code.jpg"
        assert sanitize_filename("under_score.jpg") == "under_score.jpg"


class TestDecode:
    def test_decode_and_resize(self, rng):
        imgs = [
            encode_png(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
            for h, w in [(100, 80), (50, 200), (224, 224)]
        ]
        batch = decode_images(imgs, size=64)
        assert batch.shape == (3, 64, 64, 3)
        assert batch.dtype == np.uint8

    def test_decode_preserves_bgr_values(self, rng):
        # solid-color round trip: decoded pixel values match exactly
        img = np.full((32, 32, 3), (10, 200, 30), np.uint8)
        batch = decode_images([encode_png(img)], size=32)
        np.testing.assert_array_equal(batch[0], img)

    def test_corrupt_raises(self):
        with pytest.raises(DecodeError):
            decode_images([b"not an image"], size=32)

    def test_empty(self):
        assert decode_images([], size=32).shape == (0, 32, 32, 3)

    def test_no_resize_inconsistent_shapes(self, rng):
        imgs = [
            encode_png(rng.integers(0, 256, (10, 10, 3), dtype=np.uint8)),
            encode_png(rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)),
        ]
        with pytest.raises(DecodeError, match="inconsistent"):
            decode_images(imgs, size=None)


class TestLoadDir:
    def test_sorted_and_filtered(self, rng, tmp_path):
        for name in ["b.png", "a.png", "notes.txt", "c.webp"]:
            if name.endswith(".txt"):
                (tmp_path / name).write_text("hi")
            else:
                (tmp_path / name).write_bytes(
                    encode_png(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8))
                )
        names, batch = load_image_dir(str(tmp_path), size=16)
        assert names == ["a.png", "b.png", "c.webp"]
        assert batch.shape == (3, 16, 16, 3)
