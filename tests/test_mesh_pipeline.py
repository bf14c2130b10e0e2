"""Pipeline.run_paths end to end over the device mesh (VERDICT r3 item 2).

Round 3 mesh coverage stopped at the engines (test_sharded drives
constrained_ward_* with a mesh directly); these tests run the REAL
integration — streamed ingest -> mesh-sharded embed (batch over 'data') ->
residency cast -> owner-aligned bucketed cluster over the mesh -> report —
and pin the partition against the single-device pipeline. Counterpart of
the reference orchestrator (workflow.go:66-108) at multi-chip scale.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from imageclust_tpu.config import (
    AppConfig,
    ClusterConfig,
    LabelConfig,
    NamingConfig,
)
from imageclust_tpu.pipeline import Pipeline

from helpers import color_group_images


def _toy_embedder(mesh):
    """Real Embedder (the class the production pipeline uses, with its mesh
    sharding machinery) around a tiny apply_fn — mean color x10, like
    helpers.MeanColorEmbedder but driven through the compiled DP path."""
    import jax.numpy as jnp

    from imageclust_tpu.models.registry import Embedder, EmbedderSpec

    spec = EmbedderSpec(
        name="toy", input_size=16, dim=3, scale=1 / 255.0,
        mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0), bgr_input=True,
    )

    def apply_fn(variables, x):
        return jnp.mean(x, axis=(1, 2)) * 10.0 + variables["b"]

    return Embedder(spec, apply_fn, {"b": jnp.zeros((3,))},
                    batch_size=8, mesh=mesh, tag="toy:mesh-test")


def _pipeline(mesh, feature_dtype="float32"):
    cfg = AppConfig(
        labels=LabelConfig(backend="fake"),
        naming=NamingConfig(services=("fake",), retries=1),
        # 24 images >> exact_limit=4: forces the streamed big-job path
        cluster=ClusterConfig(exact_limit=4, bucket_size=16,
                              feature_dtype=feature_dtype),
    )
    return Pipeline(cfg, mesh=mesh, embedder=_toy_embedder(mesh))


def _image_dir(rng, tmp_path, n_groups=3, per_group=8):
    names, blobs = color_group_images(rng, n_groups=n_groups,
                                      per_group=per_group, size=16)
    src = tmp_path / "imgs"
    src.mkdir()
    paths = []
    for n, b in zip(names, blobs):
        p = src / n
        p.write_bytes(b)
        paths.append(str(p))
    return names, paths


def _partition(result):
    return {frozenset(d.images) for d in result.clusters.values()}


class TestMeshPipeline:
    @pytest.mark.parametrize("feature_dtype", ["float32", "bfloat16", "int8"])
    def test_run_paths_mesh_matches_single_device(
        self, mesh8, rng, tmp_path, feature_dtype
    ):
        """Streamed embed sharded over 'data' -> residency cast ->
        owner-aligned bucketed clustering over the mesh: the partition must
        equal the single-device pipeline's on every residency dtype."""
        names, paths = _image_dir(rng, tmp_path)

        res_mesh = _pipeline(mesh8, feature_dtype).run_paths(
            paths, str(tmp_path / "wm"), min_size=3, max_size=8)
        res_one = _pipeline(None, feature_dtype).run_paths(
            paths, str(tmp_path / "w1"), min_size=3, max_size=8)

        assert _partition(res_mesh) == _partition(res_one)
        assert res_mesh.dropped == res_one.dropped
        # the mesh run produced a complete job, not just an assignment
        assert os.path.exists(res_mesh.html_path)
        md = res_mesh.metrics.to_dict()
        assert md["counters"]["images"] == len(names)
        assert md["counters"]["clusters"] == len(res_mesh.clusters)
        for d in res_mesh.clusters.values():
            assert d.labels          # per-image labels flowed through
            assert d.title           # naming ran

    def test_mesh_pipeline_recovers_color_groups(self, mesh8, rng, tmp_path):
        """With well-separated groups the mesh job must recover them exactly
        (same contract as the single-device smoke, test_stream.py)."""
        names, paths = _image_dir(rng, tmp_path, n_groups=3, per_group=4)
        res = _pipeline(mesh8).run_paths(
            paths, str(tmp_path / "w"), min_size=3, max_size=6)
        got = _partition(res)
        want = {frozenset(f"g{g}_img{i}.png" for i in range(4))
                for g in range(3)}
        assert got == want

    def test_mesh_pipeline_chain_engine(self, mesh8, rng, tmp_path):
        """The exact-semantics scale engine through the pipeline over the
        mesh (cluster.scale_engine=chain, centroid matrix row-sharded)."""
        names, paths = _image_dir(rng, tmp_path)
        cfg = AppConfig(
            labels=LabelConfig(backend="fake"),
            naming=NamingConfig(services=("fake",), retries=1),
            cluster=ClusterConfig(exact_limit=4, scale_engine="chain"),
        )
        res_mesh = Pipeline(cfg, mesh=mesh8,
                            embedder=_toy_embedder(mesh8)).run_paths(
            paths, str(tmp_path / "wm"), min_size=3, max_size=8)
        res_one = Pipeline(cfg, embedder=_toy_embedder(None)).run_paths(
            paths, str(tmp_path / "w1"), min_size=3, max_size=8)
        assert _partition(res_mesh) == _partition(res_one)
