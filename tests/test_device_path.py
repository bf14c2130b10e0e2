"""Device-resident big-job path: embed_device + on-device fuse + bucketed."""

import numpy as np

from imageclust_tpu.config import AppConfig, ClusterConfig, LabelConfig, NamingConfig
from imageclust_tpu.pipeline import Pipeline
from imageclust_tpu.types import UploadedImage

from helpers import color_group_images


class TestEmbedDevice:
    def test_matches_host_embed(self, rng):
        # exercise the real Embedder chunking through a tiny ViT tower
        # (full resnet50 is needlessly slow on the CPU test backend)
        import jax
        import jax.numpy as jnp

        from imageclust_tpu.models.registry import Embedder, EmbedderSpec
        from imageclust_tpu.models.vit import ViTConfig, VisionTransformer

        cfg = ViTConfig(patch=8, width=32, depth=1, heads=2, proj_dim=16,
                        image_size=16)
        model = VisionTransformer(cfg, dtype=jnp.float32)
        x0 = jnp.zeros((1, 3, 16, 16), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x0)
        spec = EmbedderSpec("tiny", 16, 16, 1 / 255.0, cfg.mean, cfg.std, True)
        embedder = Embedder(spec, lambda v, x: model.apply(v, x), variables,
                            batch_size=8)
        images = rng.integers(0, 256, (13, 16, 16, 3), dtype=np.uint8)
        host = embedder.embed(images)
        dev = np.asarray(embedder.embed_device(images))
        assert host.shape == dev.shape == (13, 16)
        np.testing.assert_allclose(host, dev, atol=1e-6)


class TestBigJobPipeline:
    def test_device_resident_path(self, rng, tmp_path):
        from helpers import MeanColorEmbedder

        class DeviceMeanColor(MeanColorEmbedder):
            def embed_device(self, images):
                import jax.numpy as jnp

                return jnp.asarray(self.embed(images))

        # exact_limit=10 forces the big-job path on a 16-image job
        cfg = AppConfig(
            labels=LabelConfig(backend="fake"),
            naming=NamingConfig(services=("fake",), retries=1),
            cluster=ClusterConfig(exact_limit=10, bucket_size=16),
        )
        pipe = Pipeline(cfg, embedder=DeviceMeanColor())
        names, blobs = color_group_images(rng, n_groups=4, per_group=4)
        ups = [UploadedImage(n, b) for n, b in zip(names, blobs)]
        result = pipe.run(ups, str(tmp_path), min_size=3, max_size=6)
        got = {frozenset(v.images) for v in result.clusters.values()}
        want = {frozenset(f"g{g}_img{i}.png" for i in range(4))
                for g in range(4)}
        assert got == want
        # labels were fused on device too
        for d in result.clusters.values():
            assert d.labels
