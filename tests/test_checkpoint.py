"""Checkpoint/resume + embedding cache tests (SURVEY.md §5)."""

import numpy as np
import pytest

from imageclust_tpu.utils.checkpoint import (
    EmbeddingCache,
    restore_variables,
    save_variables,
)

from helpers import MeanColorEmbedder


class TestOrbaxRoundTrip:
    def test_save_restore_variables(self, tmp_path):
        import jax.numpy as jnp

        variables = {
            "params": {"dense": {"kernel": jnp.arange(6.0).reshape(2, 3),
                                 "bias": jnp.zeros(3)}},
            "batch_stats": {"bn": {"mean": jnp.ones(4)}},
        }
        path = str(tmp_path / "ckpt")
        save_variables(path, variables)
        back = restore_variables(path, variables)
        np.testing.assert_array_equal(
            np.asarray(back["params"]["dense"]["kernel"]),
            np.asarray(variables["params"]["dense"]["kernel"]),
        )
        np.testing.assert_array_equal(
            np.asarray(back["batch_stats"]["bn"]["mean"]), np.ones(4)
        )


class CountingEmbedder(MeanColorEmbedder):
    def __init__(self):
        self.calls = 0
        self.images_embedded = 0

    def embed(self, images):
        self.calls += 1
        self.images_embedded += len(images)
        return super().embed(images)


class TestEmbeddingCache:
    def _data(self, rng, n=4):
        batch = rng.integers(0, 256, (n, 8, 8, 3), dtype=np.uint8)
        blobs = [batch[i].tobytes() for i in range(n)]
        return blobs, batch

    def test_miss_then_hit(self, rng, tmp_path):
        emb = CountingEmbedder()
        cache = EmbeddingCache(str(tmp_path), "test-model:v1")
        blobs, batch = self._data(rng)
        first = cache.embed_with_cache(emb, blobs, batch)
        assert emb.images_embedded == 4
        second = cache.embed_with_cache(emb, blobs, batch)
        assert emb.images_embedded == 4  # no new forward passes
        np.testing.assert_allclose(first, second)

    def test_partial_hit(self, rng, tmp_path):
        emb = CountingEmbedder()
        cache = EmbeddingCache(str(tmp_path), "m:v1")
        blobs, batch = self._data(rng, 4)
        cache.embed_with_cache(emb, blobs[:2], batch[:2])
        assert emb.images_embedded == 2
        out = cache.embed_with_cache(emb, blobs, batch)
        assert emb.images_embedded == 4  # only the 2 new images
        np.testing.assert_allclose(out, MeanColorEmbedder().embed(batch),
                                   atol=1e-6)

    def test_model_tag_isolation(self, rng, tmp_path):
        emb = CountingEmbedder()
        blobs, batch = self._data(rng, 2)
        EmbeddingCache(str(tmp_path), "m:v1").embed_with_cache(emb, blobs, batch)
        EmbeddingCache(str(tmp_path), "m:v2").embed_with_cache(emb, blobs, batch)
        assert emb.images_embedded == 4  # v2 must not reuse v1 vectors

    def test_pipeline_uses_cache(self, rng, tmp_path):
        from imageclust_tpu.config import AppConfig, LabelConfig, NamingConfig
        from imageclust_tpu.pipeline import Pipeline
        from imageclust_tpu.types import UploadedImage

        from helpers import color_group_images

        cfg = AppConfig(labels=LabelConfig(backend="none"),
                        naming=NamingConfig(services=()))
        emb = CountingEmbedder()
        emb.tag = "counting:v1"
        pipe = Pipeline(cfg, embedder=emb)
        names, blobs = color_group_images(rng, n_groups=1, per_group=4)
        ups = [UploadedImage(n, b) for n, b in zip(names, blobs)]
        pipe.run(ups, str(tmp_path), min_size=3, max_size=6)
        assert emb.images_embedded == 4
        # same work dir, same images -> all hits
        r2 = pipe.run(ups, str(tmp_path), min_size=3, max_size=6)
        assert emb.images_embedded == 4
        assert r2.metrics.counters["embed_cache_hits"] == 4


class TestDecodeFallback:
    def test_gif_via_pil(self, rng, tmp_path):
        from PIL import Image

        from imageclust_tpu.data.loader import decode_images

        img = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
        p = tmp_path / "x.gif"
        Image.fromarray(img).save(str(p))
        batch = decode_images([p.read_bytes()], size=16)
        assert batch.shape == (1, 16, 16, 3)
