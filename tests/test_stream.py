"""Streaming ingest: bounded-memory chunked decode -> device embed.

VERDICT r1 item 2: the production path used to materialize the whole job as
one (N,224,224,3) host array (15 GB at 100k images); these tests pin the
replacement — stream_decode chunking/laziness and the pipeline's streamed
big-job flow producing the same clusters as the all-at-once path.
"""

import dataclasses
import os

import numpy as np
import pytest

from imageclust_tpu.config import AppConfig, ClusterConfig, LabelConfig, NamingConfig
from imageclust_tpu.data.loader import DecodeError, decode_images, stream_decode
from imageclust_tpu.pipeline import Pipeline
from imageclust_tpu.types import UploadedImage

from helpers import MeanColorEmbedder, color_group_images, encode_png


class TestStreamDecode:
    def test_chunks_and_order(self, rng):
        _, blobs = color_group_images(rng, n_groups=2, per_group=5)  # 10
        got = list(stream_decode(blobs, size=32, batch=4))
        assert [g[0] for g in got] == [0, 4, 8]
        assert [g[2].shape for g in got] == [
            (4, 32, 32, 3), (4, 32, 32, 3), (2, 32, 32, 3)]
        # identical pixels to the all-at-once path
        ref = decode_images(blobs, size=32, workers=2)
        np.testing.assert_array_equal(np.concatenate([g[2] for g in got]), ref)
        # raw bytes surfaced per chunk (for per-image labelers)
        assert got[0][1] == blobs[:4]

    def test_paths_read_lazily(self, rng, tmp_path):
        names, blobs = color_group_images(rng, n_groups=1, per_group=6)
        paths = []
        for n, b in zip(names, blobs):
            p = tmp_path / n
            p.write_bytes(b)
            paths.append(str(p))
        got = list(stream_decode(paths, size=32, batch=4))
        ref = decode_images(blobs, size=32)
        np.testing.assert_array_equal(np.concatenate([g[2] for g in got]), ref)

    def test_decode_error_propagates(self):
        with pytest.raises(DecodeError):
            list(stream_decode([b"not an image"], size=32, batch=2))

    def test_empty(self):
        assert list(stream_decode([], size=32, batch=4)) == []


class TestEmbedStream:
    def test_matches_embed(self, rng):
        """Real Embedder.embed_stream == Embedder.embed on the same pixels
        (pad/tail handling, single compiled shape)."""
        import jax.numpy as jnp

        from imageclust_tpu.models.registry import Embedder, EmbedderSpec

        spec = EmbedderSpec(
            name="toy", input_size=16, dim=3, scale=1 / 255.0,
            mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0), bgr_input=True,
        )

        def apply_fn(variables, x):
            return jnp.mean(x, axis=(1, 2)) + variables["b"]

        emb = Embedder(spec, apply_fn, {"b": jnp.zeros((3,))}, batch_size=4)
        images = rng.integers(0, 256, (11, 16, 16, 3), dtype=np.uint8)
        want = emb.embed(images)
        got = np.asarray(emb.embed_stream(
            images[i:i + 4] for i in range(0, 11, 4)))
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_rejects_oversize_chunk(self, rng):
        import jax.numpy as jnp

        from imageclust_tpu.models.registry import Embedder, EmbedderSpec

        spec = EmbedderSpec("toy", 8, 3, 1.0, (0.0,) * 3, (1.0,) * 3, True)
        emb = Embedder(spec, lambda v, x: jnp.mean(x, axis=(1, 2)), {},
                       batch_size=2)
        with pytest.raises(ValueError, match="stream chunk"):
            np.asarray(emb.embed_stream(
                [np.zeros((5, 8, 8, 3), np.uint8)]))


@pytest.fixture()
def stream_pipeline():
    cfg = AppConfig(
        labels=LabelConfig(backend="fake"),
        naming=NamingConfig(services=("fake",), retries=1),
        # force the big-job streamed path at 12 images
        cluster=ClusterConfig(exact_limit=4, bucket_size=16),
    )
    return Pipeline(cfg, embedder=MeanColorEmbedder())


class TestPipelineStreaming:
    def _image_dir(self, rng, tmp_path):
        names, blobs = color_group_images(rng, n_groups=3, per_group=4)
        src = tmp_path / "imgs"
        src.mkdir()
        paths = []
        for n, b in zip(names, blobs):
            p = src / n
            p.write_bytes(b)
            paths.append(str(p))
        return names, blobs, paths

    def test_run_paths_streamed_matches_upload_path(
        self, stream_pipeline, rng, tmp_path
    ):
        names, blobs, paths = self._image_dir(rng, tmp_path)
        work_a = tmp_path / "a"
        work_b = tmp_path / "b"
        work_a.mkdir(), work_b.mkdir()

        res_stream = stream_pipeline.run_paths(
            paths, str(work_a), min_size=3, max_size=6)
        uploads = [UploadedImage(n, b) for n, b in zip(names, blobs)]
        res_upload = stream_pipeline.run(
            uploads, str(work_b), min_size=3, max_size=6)

        got = {frozenset(d.images) for d in res_stream.clusters.values()}
        want = {frozenset(d.images) for d in res_upload.clusters.values()}
        assert got == want
        # per-image labels were produced through the streamed path too
        for d in res_stream.clusters.values():
            assert d.labels
        assert os.path.exists(res_stream.html_path)
        md = res_stream.metrics.to_dict()
        assert md["counters"]["images"] == 12
        assert "embed" in md["stages_s"]

    def test_run_paths_small_job_uses_exact_engine(self, rng, tmp_path):
        cfg = AppConfig(
            labels=LabelConfig(backend="fake"),
            naming=NamingConfig(services=("fake",), retries=1),
        )
        pipe = Pipeline(cfg, embedder=MeanColorEmbedder())
        _, _, paths = self._image_dir(rng, tmp_path)
        res = pipe.run_paths(paths, str(tmp_path / "w"), min_size=3, max_size=6)
        got = {frozenset(d.images) for d in res.clusters.values()}
        want = {
            frozenset(f"g{g}_img{i}.png" for i in range(4)) for g in range(3)
        }
        assert got == want

    def test_run_paths_dedups_colliding_basenames(self, rng, tmp_path):
        _, blobs = color_group_images(rng, n_groups=1, per_group=3)
        a = tmp_path / "a"
        b = tmp_path / "b"
        a.mkdir(), b.mkdir()
        paths = []
        for d, blob in zip((a, b, a), blobs):
            p = d / ("x.png" if d != a or not paths else "y.png")
            p.write_bytes(blob)
            paths.append(str(p))
        cfg = AppConfig(labels=LabelConfig(backend="fake"),
                        naming=NamingConfig(services=("fake",), retries=1))
        pipe = Pipeline(cfg, embedder=MeanColorEmbedder())
        res = pipe.run_paths(paths, str(tmp_path / "w"), min_size=3, max_size=6)
        (details,) = res.clusters.values()
        assert sorted(details.images) == ["x.png", "x_1.png", "y.png"]


class TestEmbedStreamQuantized:
    def _toy(self):
        import jax.numpy as jnp

        from imageclust_tpu.models.registry import Embedder, EmbedderSpec

        spec = EmbedderSpec(
            name="toy", input_size=16, dim=3, scale=1 / 255.0,
            mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0), bgr_input=True,
        )

        def apply_fn(variables, x):
            return jnp.mean(x, axis=(1, 2)) + variables["b"]

        return Embedder(spec, apply_fn, {"b": jnp.zeros((3,))}, batch_size=4)

    def test_int8_matches_manual_quantization(self, rng):
        import jax.numpy as jnp

        emb = self._toy()
        images = rng.integers(0, 256, (11, 16, 16, 3), dtype=np.uint8)
        f32 = emb.embed(images)
        got, scale = emb.embed_stream_quantized(
            (images[i:i + 4] for i in range(0, 11, 4)),
            out_dtype=jnp.int8)
        got = np.asarray(got)
        assert got.dtype == np.int8 and got.shape == f32.shape
        # scale calibrated on the FIRST chunk only
        want_scale = float(np.abs(f32[:4]).max()) * 1.25 / 127.0
        assert abs(scale - want_scale) < 1e-6 * want_scale
        want = np.clip(np.round(f32 / scale), -127, 127)
        np.testing.assert_array_equal(got, want.astype(np.int8))

    def test_bf16_is_plain_cast(self, rng):
        import jax.numpy as jnp

        emb = self._toy()
        images = rng.integers(0, 256, (8, 16, 16, 3), dtype=np.uint8)
        f32 = emb.embed(images)
        got, scale = emb.embed_stream_quantized(
            (images[i:i + 4] for i in range(0, 8, 4)),
            out_dtype=jnp.bfloat16)
        assert scale == 1.0 and got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got, np.float32), f32, rtol=1e-2)

    def test_f32_passthrough_matches_embed_stream(self, rng):
        emb = self._toy()
        images = rng.integers(0, 256, (8, 16, 16, 3), dtype=np.uint8)
        got, scale = emb.embed_stream_quantized(
            (images[i:i + 4] for i in range(0, 8, 4)))
        assert scale == 1.0
        np.testing.assert_allclose(
            np.asarray(got),
            np.asarray(emb.embed_stream(
                images[i:i + 4] for i in range(0, 8, 4))), rtol=1e-6)


class TestPipelineStreamedResidency:
    def test_run_paths_int8_residency_recovers_groups(self, rng, tmp_path):
        """Streamed big job straight into int8 residency (the f32 matrix
        never exists): groups recovered, label block on the same grid."""
        cfg = AppConfig(
            labels=LabelConfig(backend="fake"),
            naming=NamingConfig(services=("fake",), retries=1),
            cluster=ClusterConfig(exact_limit=4, bucket_size=16,
                                  feature_dtype="int8"),
        )
        pipe = Pipeline(cfg, embedder=MeanColorEmbedder())
        names, blobs = color_group_images(rng, n_groups=3, per_group=4)
        src = tmp_path / "imgs"
        src.mkdir()
        paths = []
        for n, b in zip(names, blobs):
            p = src / n
            p.write_bytes(b)
            paths.append(str(p))
        res = pipe.run_paths(paths, str(tmp_path / "w"), min_size=3,
                             max_size=6)
        got = {frozenset(d.images) for d in res.clusters.values()}
        want = {frozenset(f"g{g}_img{i}.png" for i in range(4))
                for g in range(3)}
        assert got == want

    def test_run_paths_text_fusion_int8_combined(self, rng, tmp_path):
        """Config 5 wired end to end: dense text-label fusion + streamed
        int8 residency in one job — the label block lands on the image
        block's grid and the groups still come out."""
        cfg = AppConfig(
            labels=LabelConfig(backend="fake", fusion="text",
                               fusion_weight=4.0),
            naming=NamingConfig(services=("fake",), retries=1),
            cluster=ClusterConfig(exact_limit=4, bucket_size=16,
                                  feature_dtype="int8"),
        )
        pipe = Pipeline(cfg, embedder=MeanColorEmbedder())
        names, blobs = color_group_images(rng, n_groups=3, per_group=4)
        src = tmp_path / "imgs"
        src.mkdir()
        paths = []
        for n, b in zip(names, blobs):
            p = src / n
            p.write_bytes(b)
            paths.append(str(p))
        res = pipe.run_paths(paths, str(tmp_path / "w"), min_size=3,
                             max_size=6)
        got = {frozenset(d.images) for d in res.clusters.values()}
        want = {frozenset(f"g{g}_img{i}.png" for i in range(4))
                for g in range(3)}
        assert got == want


class TestMeshBatchRounding:
    def test_embedder_batch_rounds_to_device_multiple(self, mesh8):
        """With a mesh, Embedder.batch_size is the EFFECTIVE (device-
        divisible) size — producers that chunk at embedder.batch_size can
        never build a chunk the stream path rejects."""
        import jax.numpy as jnp

        from imageclust_tpu.models.registry import Embedder, EmbedderSpec

        spec = EmbedderSpec(
            name="toy", input_size=16, dim=3, scale=1 / 255.0,
            mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0), bgr_input=True,
        )

        def apply_fn(variables, x):
            return jnp.mean(x, axis=(1, 2)) + variables["b"]

        emb = Embedder(spec, apply_fn, {"b": jnp.zeros((3,))},
                       batch_size=10, mesh=mesh8)
        assert emb.batch_size == 8  # rounded to the data-axis multiple (4)
        images = np.random.default_rng(0).integers(
            0, 256, (11, 16, 16, 3), dtype=np.uint8)
        out, scale = emb.embed_stream_quantized(
            images[i:i + emb.batch_size]
            for i in range(0, 11, emb.batch_size))
        assert np.asarray(out).shape == (11, 3) and scale == 1.0


class TestEmbedStreamPrealloc:
    """VERDICT r4 item 1 groundwork: the 10M tier accumulates embeddings in
    ONE preallocated donated buffer (the list path's final concatenate needs
    2x the feature bytes — more HBM than exists at 10M x 512), and ingest
    chunks may be DEVICE arrays (on-device synthetic ingest: pixels never
    cross the ~20 MB/s host link)."""

    def _toy(self, batch_size=4):
        import jax.numpy as jnp

        from imageclust_tpu.models.registry import Embedder, EmbedderSpec

        spec = EmbedderSpec(
            name="toy", input_size=16, dim=3, scale=1 / 255.0,
            mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0), bgr_input=True,
        )

        def apply_fn(variables, x):
            return jnp.mean(x, axis=(1, 2)) + variables["b"]

        return Embedder(spec, apply_fn, {"b": jnp.zeros((3,))},
                        batch_size=batch_size)

    def test_total_matches_concat_path_all_dtypes(self, rng):
        import jax.numpy as jnp

        emb = self._toy()
        images = rng.integers(0, 256, (11, 16, 16, 3), dtype=np.uint8)
        chunks = lambda: (images[i:i + 4] for i in range(0, 11, 4))
        for dt in (None, jnp.bfloat16, jnp.int8):
            want, s_want = emb.embed_stream_quantized(chunks(), out_dtype=dt)
            got, s_got = emb.embed_stream_quantized(
                chunks(), out_dtype=dt, total=11)
            assert s_got == s_want
            assert got.shape == (11, 3) and got.dtype == want.dtype
            np.testing.assert_array_equal(
                np.asarray(got, np.float32), np.asarray(want, np.float32))

    def test_device_chunks_match_host(self, rng):
        import jax.numpy as jnp

        emb = self._toy()
        images = rng.integers(0, 256, (11, 16, 16, 3), dtype=np.uint8)
        want, _ = emb.embed_stream_quantized(
            (images[i:i + 4] for i in range(0, 11, 4)), total=11)
        got, _ = emb.embed_stream_quantized(
            (jnp.asarray(images[i:i + 4]) for i in range(0, 11, 4)),
            total=11)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        # and through the list path too
        got2, _ = emb.embed_stream_quantized(
            jnp.asarray(images[i:i + 4]) for i in range(0, 11, 4))
        np.testing.assert_array_equal(np.asarray(got2), np.asarray(want))

    def test_total_mismatch_raises(self, rng):
        emb = self._toy()
        images = rng.integers(0, 256, (8, 16, 16, 3), dtype=np.uint8)
        chunks = lambda: (images[i:i + 4] for i in range(0, 8, 4))
        with pytest.raises(ValueError, match="expected total"):
            emb.embed_stream_quantized(chunks(), total=11)
        with pytest.raises(ValueError, match="more than total"):
            emb.embed_stream_quantized(chunks(), total=6)


class TestRunStream:
    """Pipeline.run_stream: the tier-scale entry (device-chunk ingest ->
    preallocated residency buffer -> columnar cluster -> budgeted naming ->
    report) produces the same partition as run_paths on the same pixels."""

    def _setup(self, rng, tmp_path, feature_dtype="float32"):
        import jax.numpy as jnp

        from imageclust_tpu.models.registry import Embedder, EmbedderSpec

        names, blobs = color_group_images(rng, n_groups=3, per_group=6,
                                          size=16)
        src = tmp_path / "imgs"
        src.mkdir(exist_ok=True)
        paths = []
        for n, b in zip(names, blobs):
            p = src / n
            p.write_bytes(b)
            paths.append(str(p))

        spec = EmbedderSpec(
            name="toy", input_size=16, dim=3, scale=1 / 255.0,
            mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0), bgr_input=True,
        )

        def apply_fn(variables, x):
            return jnp.mean(x, axis=(1, 2)) * 10.0 + variables["b"]

        def embedder():
            return Embedder(spec, apply_fn, {"b": jnp.zeros((3,))},
                            batch_size=4, tag="toy:run-stream")

        def cfg():
            return AppConfig(
                labels=LabelConfig(backend="none"),
                naming=NamingConfig(services=("fake",), retries=1),
                cluster=ClusterConfig(exact_limit=4, bucket_size=8,
                                      feature_dtype=feature_dtype),
            )

        return names, blobs, paths, embedder, cfg

    def test_matches_run_paths_partition(self, rng, tmp_path):
        names, blobs, paths, embedder, cfg = self._setup(rng, tmp_path)
        ref = Pipeline(cfg(), embedder=embedder()).run_paths(
            paths, str(tmp_path / "ref"), min_size=3, max_size=6)

        images = decode_images(blobs, size=16)
        res = Pipeline(cfg(), embedder=embedder()).run_stream(
            (images[i:i + 4] for i in range(0, len(names), 4)),
            len(names), str(tmp_path / "stream"),
            name_fn=lambda i: names[i], min_size=3, max_size=6)

        got = {frozenset(d.images) for d in res.clusters.values()}
        want = {frozenset(d.images) for d in ref.clusters.values()}
        assert got == want
        assert sorted(res.dropped) == sorted(ref.dropped)
        assert os.path.exists(res.html_path)
        for d in res.clusters.values():
            assert d.title  # naming flowed through
        md = res.metrics.to_dict()
        assert md["counters"]["images"] == len(names)
        for stage in ("embed", "cluster", "name", "report"):
            assert stage in md["stages_s"]

    def test_residency_dtype_and_budget(self, rng, tmp_path):
        """bf16 residency through run_stream + the naming budget: only the
        top-N clusters are named, the skip counter is explicit."""
        names, blobs, paths, embedder, cfg = self._setup(
            rng, tmp_path, feature_dtype="bfloat16")
        c = cfg()
        c.naming.max_clusters = 2
        images = decode_images(blobs, size=16)
        res = Pipeline(c, embedder=embedder()).run_stream(
            (images[i:i + 4] for i in range(0, len(names), 4)),
            len(names), str(tmp_path / "budget"),
            name_fn=lambda i: names[i], min_size=3, max_size=6)
        n_clusters = len(res.clusters)
        assert n_clusters > 2
        titled = [d for d in res.clusters.values() if d.title]
        assert len(titled) == 2
        md = res.metrics.to_dict()
        assert md["counters"]["naming_skipped"] == n_clusters - 2

    def test_default_name_fn_and_blob_labeler_rejected(self, rng, tmp_path):
        names, blobs, paths, embedder, cfg = self._setup(rng, tmp_path)
        images = decode_images(blobs, size=16)
        res = Pipeline(cfg(), embedder=embedder()).run_stream(
            (images[i:i + 4] for i in range(0, len(names), 4)),
            len(names), str(tmp_path / "default"), min_size=3, max_size=6)
        all_names = {n for d in res.clusters.values() for n in d.images}
        assert all(n.startswith("img_") and n.endswith(".jpg")
                   for n in all_names)

        c = cfg()
        c.labels = LabelConfig(backend="fake")
        with pytest.raises(ValueError, match="run_stream supports"):
            Pipeline(c, embedder=embedder()).run_stream(
                iter(()), 4, str(tmp_path / "rej"))
