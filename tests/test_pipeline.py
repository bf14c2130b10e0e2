"""End-to-end pipeline tests (workflow.go Run parity, SURVEY.md §3.2)."""

import os

import numpy as np
import pytest

from imageclust_tpu.config import AppConfig, ClusterConfig, LabelConfig, NamingConfig
from imageclust_tpu.pipeline import Pipeline
from imageclust_tpu.types import UploadedImage

from helpers import MeanColorEmbedder, color_group_images


@pytest.fixture()
def pipeline():
    cfg = AppConfig(
        labels=LabelConfig(backend="fake"),
        naming=NamingConfig(services=("fake",), retries=1),
    )
    return Pipeline(cfg, embedder=MeanColorEmbedder())


class TestPipelineRun:
    def test_end_to_end(self, pipeline, rng, tmp_path):
        names, blobs = color_group_images(rng, n_groups=3, per_group=4)
        uploads = [UploadedImage(n, b) for n, b in zip(names, blobs)]
        result = pipeline.run(uploads, str(tmp_path), min_size=3, max_size=6)

        # cluster keys shaped like the reference (workflow.go:192)
        assert all(k.startswith("Cluster-") for k in result.clusters)
        # color groups recovered exactly (12 items, (3,6) -> target 3)
        got = {frozenset(d.images) for d in result.clusters.values()}
        want = {
            frozenset(f"g{g}_img{i}.png" for i in range(4)) for g in range(3)
        }
        assert got == want
        # details populated
        for d in result.clusters.values():
            assert d.title and d.catchy_phrase  # primary title set (fix of
            # the reference's dead "Claude 3" lookup, workflow.go:219-222)
            assert d.service_outputs[0].service_name == "Offline Namer"
            assert d.labels
        # report written
        assert os.path.exists(result.html_path)
        html = open(result.html_path).read()
        assert "comparison-table" in html
        assert "g0_img0.png" in html
        # images persisted for /api/image
        assert os.path.exists(tmp_path / "images" / "g0_img0.png")
        # metrics
        md = result.metrics.to_dict()
        assert md["counters"]["images"] == 12
        assert "embed" in md["stages_s"]

    def test_filename_sanitization_and_collisions(self, pipeline, rng, tmp_path):
        _, blobs = color_group_images(rng, n_groups=1, per_group=3)
        uploads = [
            UploadedImage("../../evil path!.png", blobs[0]),
            UploadedImage(".._.._evil_path_.png", blobs[1]),  # collides
            UploadedImage("ok.png", blobs[2]),
        ]
        result = pipeline.run(uploads, str(tmp_path), min_size=3, max_size=6)
        files = sorted(os.listdir(tmp_path / "images"))
        assert ".._.._evil_path_.png" in files
        assert ".._.._evil_path__1.png" in files
        assert "ok.png" in files
        assert not any("/" in f for f in files)
        (details,) = result.clusters.values()
        assert len(details.images) == 3

    def test_no_images_raises(self, pipeline, tmp_path):
        with pytest.raises(ValueError, match="no images"):
            pipeline.run([], str(tmp_path))

    def test_invalid_bounds_raise(self, pipeline, rng, tmp_path):
        _, blobs = color_group_images(rng, n_groups=1, per_group=3)
        ups = [UploadedImage(f"a{i}.png", b) for i, b in enumerate(blobs)]
        with pytest.raises(ValueError, match="invalid cluster size"):
            pipeline.run(ups, str(tmp_path), min_size=5, max_size=2)

    def test_infeasible_constraints_raise(self, pipeline, rng, tmp_path):
        from imageclust_tpu.cluster import ConstraintError

        _, blobs = color_group_images(rng, n_groups=1, per_group=2)
        ups = [UploadedImage(f"a{i}.png", b) for i, b in enumerate(blobs)]
        with pytest.raises(ConstraintError):
            pipeline.run(ups, str(tmp_path), min_size=3, max_size=6)

    def test_corrupt_image_fails_run(self, pipeline, rng, tmp_path):
        from imageclust_tpu.data.loader import DecodeError

        _, blobs = color_group_images(rng, n_groups=1, per_group=3)
        ups = [UploadedImage(f"a{i}.png", b) for i, b in enumerate(blobs)]
        ups.append(UploadedImage("bad.png", b"this is not an image"))
        with pytest.raises(DecodeError):
            pipeline.run(ups, str(tmp_path), min_size=3, max_size=6)

    def test_label_cache_reused_across_runs(self, rng, tmp_path):
        cfg = AppConfig(
            labels=LabelConfig(backend="fake"),
            naming=NamingConfig(services=(), retries=1),
        )
        pipe = Pipeline(cfg, embedder=MeanColorEmbedder())
        names, blobs = color_group_images(rng, n_groups=1, per_group=3)
        ups = [UploadedImage(n, b) for n, b in zip(names, blobs)]
        pipe.run(ups, str(tmp_path), min_size=3, max_size=6)
        label_files = [f for f in os.listdir(tmp_path / "cache")
                       if f.endswith("_labels.json")]
        assert len(label_files) == 3  # one per unique image content

    def test_no_namers_leaves_title_empty(self, rng, tmp_path):
        cfg = AppConfig(
            labels=LabelConfig(backend="none"),
            naming=NamingConfig(services=(), retries=1),
        )
        pipe = Pipeline(cfg, embedder=MeanColorEmbedder())
        names, blobs = color_group_images(rng, n_groups=2, per_group=4)
        ups = [UploadedImage(n, b) for n, b in zip(names, blobs)]
        result = pipe.run(ups, str(tmp_path), min_size=3, max_size=6)
        for d in result.clusters.values():
            assert d.title == ""
            assert d.service_outputs == []
            assert d.labels == ""


class TestZeroShotBatched:
    def test_labels_come_from_batch_embeddings(self, rng, tmp_path):
        from imageclust_tpu.config import AppConfig, LabelConfig, NamingConfig
        from imageclust_tpu.pipeline import Pipeline
        from imageclust_tpu.types import UploadedImage

        from helpers import MeanColorEmbedder, color_group_images

        class CountingEmb(MeanColorEmbedder):
            calls = 0

            def embed(self, images):
                CountingEmb.calls += 1
                return super().embed(images)

        cfg = AppConfig(
            labels=LabelConfig(backend="zero_shot", min_confidence=0.0),
            naming=NamingConfig(services=(), retries=1),
        )
        emb = CountingEmb()
        pipe = Pipeline(cfg, embedder=emb)
        names, blobs = color_group_images(rng, n_groups=1, per_group=4)
        ups = [UploadedImage(n, b) for n, b in zip(names, blobs)]
        result = pipe.run(ups, str(tmp_path), min_size=3, max_size=6)
        # exactly ONE embed call (the batch) — no per-image zero-shot passes
        assert CountingEmb.calls == 1
        for d in result.clusters.values():
            assert d.labels  # labels produced from the embeddings
