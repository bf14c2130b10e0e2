"""Nearest-neighbor-chain constrained Ward (cluster/chain.py).

Ward linkage is reducible and the maxSize poisoning is monotone, so the
chain dendrogram equals the greedy engine's wherever merge distances are
distinct (chain.py's module docstring carries the argument). These tests pin
that equivalence against BOTH independent arbiters: the greedy engine
(itself oracle-parity-tested against the clustering.go transliteration) and
SciPy's Ward linkage.
"""

import numpy as np
import pytest

from imageclust_tpu.cluster import (
    constrained_ward,
    constrained_ward_chain,
)
from imageclust_tpu.cluster.ward import ConstraintError


def _partition(result):
    """Order-free view of a ClusterResult: set of frozensets of member ids."""
    return {frozenset(m) for m in result.cluster_map.values()}


@pytest.fixture()
def gauss(rng):
    def make(n, d=8, scale=1.0):
        return (rng.standard_normal((n, d)) * scale).astype(np.float32)

    return make


class TestChainMatchesGreedy:
    """Chain partition == greedy exact-engine partition on tie-free floats."""

    @pytest.mark.parametrize("n,mn,mx", [(60, 3, 6), (200, 3, 6), (333, 2, 9)])
    def test_constrained(self, gauss, n, mn, mx):
        x = gauss(n)
        ref = constrained_ward(x, min_size=mn, max_size=mx)
        got = constrained_ward_chain(
            x, min_size=mn, max_size=mx, reassign_dropped=False)
        assert _partition(got) == _partition(ref)
        assert set(got.dropped) == set(ref.dropped)

    def test_unconstrained_sizes(self, gauss):
        # max_size = n disables poisoning: pure Ward dendrogram cut
        x = gauss(120)
        ref = constrained_ward(x, min_size=1, max_size=120)
        got = constrained_ward_chain(
            x, min_size=1, max_size=120, reassign_dropped=False)
        assert _partition(got) == _partition(ref)

    def test_device_array_input(self, gauss):
        import jax.numpy as jnp

        x = gauss(90)
        ref = constrained_ward_chain(x, reassign_dropped=False)
        got = constrained_ward_chain(jnp.asarray(x), reassign_dropped=False)
        assert _partition(got) == _partition(ref)


class TestChainGreedyFuzz:
    """Property fuzz over seeds and constraint shapes: the chain partition
    must equal the greedy engine's on continuous (generically tie-free)
    data. Seeded gaussians rather than raw hypothesis floats — hypothesis
    shrinks toward duplicated values, i.e. mathematically TIED Ward
    distances, which are outside the equivalence guarantee (chain.py
    docstring; same caveat domain as tests/test_ward_fuzz.py)."""

    from hypothesis import given, settings, strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        seed=st.integers(0, 2**31 - 1),
        n=st.integers(10, 120),
        mn=st.integers(1, 4),
        span=st.integers(1, 6),
        d=st.integers(2, 12),
    )
    def test_matches_greedy(self, seed, n, mn, span, d):
        from imageclust_tpu.cluster.ward import ConstraintError

        x = (np.random.default_rng(seed)
             .standard_normal((n, d)).astype(np.float32))
        mx = mn + span
        try:
            ref = constrained_ward(x, min_size=mn, max_size=mx)
        except ConstraintError:
            with pytest.raises(ConstraintError):
                constrained_ward_chain(x, min_size=mn, max_size=mx)
            return
        got = constrained_ward_chain(
            x, min_size=mn, max_size=mx, reassign_dropped=False)
        assert _partition(got) == _partition(ref)
        assert set(got.dropped) == set(ref.dropped)


class TestChainMatchesScipy:
    def test_unconstrained_partition(self, rng):
        pytest.importorskip("scipy")
        from scipy.cluster.hierarchy import fcluster, linkage

        n = 150
        x = rng.standard_normal((n, 16)).astype(np.float32)
        # max_size = n disables poisoning: the cut at the chain's own target
        # must match scipy's maxclust cut of the same Ward dendrogram
        got = constrained_ward_chain(
            x, min_size=1, max_size=n, reassign_dropped=False)
        want = fcluster(linkage(x, method="ward"), len(got.cluster_map),
                        criterion="maxclust")
        assign = got.assignments()
        pairs = {(a, b) for a in range(n) for b in range(a)
                 if assign[a] >= 0 and assign[a] == assign[b]}
        pairs_scipy = {(a, b) for a in range(n) for b in range(a)
                       if want[a] == want[b]}
        assert pairs == pairs_scipy


class TestConstraints:
    def test_max_size_respected(self, gauss):
        x = gauss(257)
        res = constrained_ward_chain(x, min_size=3, max_size=6)
        for members in res.cluster_map.values():
            assert len(members) <= 6

    def test_no_loss_default(self, gauss):
        x = gauss(500)
        res = constrained_ward_chain(x, min_size=3, max_size=6)
        placed = sum(len(m) for m in res.cluster_map.values())
        assert placed + len(res.dropped) == 500
        assert not res.dropped  # spill pass places everything here
        for members in res.cluster_map.values():
            assert 1 <= len(members) <= 6

    def test_parity_drop_semantics(self, gauss):
        x = gauss(100)
        res = constrained_ward_chain(x, reassign_dropped=False)
        placed = sum(len(m) for m in res.cluster_map.values())
        assert placed + len(res.dropped) == 100
        for members in res.cluster_map.values():
            assert 3 <= len(members) <= 6

    def test_deterministic(self, gauss):
        x = gauss(180)
        a = constrained_ward_chain(x)
        b = constrained_ward_chain(x)
        assert a.cluster_map == b.cluster_map
        assert a.dropped == b.dropped

    def test_infeasible_raises(self, gauss):
        with pytest.raises(ConstraintError):
            constrained_ward_chain(gauss(2), min_size=3, max_size=6)

    def test_merge_log_heights_cover_cut(self, gauss):
        x = gauss(64)
        res = constrained_ward_chain(x, reassign_dropped=False)
        # applied merges = n - target (feasible here)
        assert res.merges.shape[0] == 64 - res.n_clusters_target


class TestRobustness:
    def test_cut_monotone_correction(self):
        # crafted float-rounding inversion: the parent merge (birth 5)
        # carries a height BELOW its child's (birth 4). An uncorrected
        # height sort would apply the parent without the child (duplicating
        # leaves); the monotone-corrected cut must keep them consistent.
        from imageclust_tpu.cluster.chain import _cut

        log = np.array([[1, 0, 4], [4, 2, 5], [5, 3, 6]], np.int32)
        heights = np.array([1.0, 0.99999, 2.0], np.float32)  # inversion
        clusters, applied = _cut(log, heights, n_items=4, n_target=2)
        # take = 2 merges: corrected order applies child then parent
        flat = sorted(i for mem in clusters for i in mem)
        assert flat == [0, 1, 2, 3]  # every leaf exactly once
        assert {frozenset(m) for m in clusters} == {
            frozenset({0, 1, 2}), frozenset({3})}
        assert list(applied) == [0, 1]

    def test_mesh_engine_matches_single_device(self, gauss, mesh8,
                                               monkeypatch):
        # the shard_map chain (cents row-sharded over 'data') must produce
        # the exact same partition as the single-device SEQUENTIAL loop —
        # the per-step psum/pmin formulation is bit-identical by
        # construction (the default reciprocal-NN path has its own
        # equivalence test; its counter stamps legitimately differ)
        monkeypatch.setenv("IMAGECLUST_CHAIN_IMPL", "seq")
        for n, mn, mx in [(100, 3, 6), (257, 2, 9)]:
            x = gauss(n)
            ref = constrained_ward_chain(
                x, min_size=mn, max_size=mx, reassign_dropped=False)
            got = constrained_ward_chain(
                x, min_size=mn, max_size=mx, reassign_dropped=False,
                mesh=mesh8)
            assert _partition(got) == _partition(ref)
            assert set(got.dropped) == set(ref.dropped)
            np.testing.assert_array_equal(got.merges, ref.merges)

    def test_mesh_rnn_matches_single_device(self, gauss, mesh8):
        # the DEFAULT reciprocal-NN path also runs mesh-sharded (centroid
        # matrix row-sharded over 'data', caches repaired via local scans
        # + all_gather); partitions must match the single-device engine
        for n, mn, mx in [(150, 3, 6), (257, 2, 9)]:
            x = gauss(n)
            ref = constrained_ward_chain(
                x, min_size=mn, max_size=mx, reassign_dropped=False)
            got = constrained_ward_chain(
                x, min_size=mn, max_size=mx, reassign_dropped=False,
                mesh=mesh8)
            assert _partition(got) == _partition(ref)
            assert set(got.dropped) == set(ref.dropped)

    def test_rnn_rounds_match_sequential_chain(self, gauss, monkeypatch):
        # the default batched reciprocal-NN implementation realizes the
        # same dendrogram as the sequential chain on tie-free data — the
        # partitions (and drop sets) must coincide
        for n, mn, mx in [(150, 3, 6), (257, 2, 9), (64, 1, 64)]:
            x = gauss(n)
            monkeypatch.setenv("IMAGECLUST_CHAIN_IMPL", "rnn")
            got = constrained_ward_chain(
                x, min_size=mn, max_size=mx, reassign_dropped=False)
            monkeypatch.setenv("IMAGECLUST_CHAIN_IMPL", "seq")
            ref = constrained_ward_chain(
                x, min_size=mn, max_size=mx, reassign_dropped=False)
            assert _partition(got) == _partition(ref)
            assert set(got.dropped) == set(ref.dropped)

    def test_mesh_sharded_input_consolidates(self, gauss, mesh8):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        x = gauss(96)
        xs = jax.device_put(
            jax.numpy.asarray(x), NamedSharding(mesh8, P("data")))
        got = constrained_ward_chain(xs, reassign_dropped=False)
        ref = constrained_ward_chain(x, reassign_dropped=False)
        assert _partition(got) == _partition(ref)

    def test_pipeline_rejects_unknown_scale_engine(self, rng, tmp_path):
        from helpers import MeanColorEmbedder, color_group_images

        from imageclust_tpu.config import AppConfig, ClusterConfig
        from imageclust_tpu.pipeline import Pipeline
        from imageclust_tpu.types import UploadedImage

        cfg = AppConfig(cluster=ClusterConfig(
            exact_limit=4, scale_engine="chian"))  # typo must fail loud
        pipe = Pipeline(cfg, embedder=MeanColorEmbedder())
        names, blobs = color_group_images(rng, per_group=4)
        ups = [UploadedImage(n, b) for n, b in zip(names, blobs)]
        with pytest.raises(ValueError, match="scale_engine"):
            pipe.run(ups, tmp_path.as_posix())

    def test_pipeline_runs_chain_engine(self, rng, tmp_path):
        from helpers import MeanColorEmbedder, color_group_images

        from imageclust_tpu.config import AppConfig, ClusterConfig
        from imageclust_tpu.pipeline import Pipeline
        from imageclust_tpu.types import UploadedImage

        cfg = AppConfig(cluster=ClusterConfig(
            exact_limit=4, scale_engine="chain"))
        pipe = Pipeline(cfg, embedder=MeanColorEmbedder())
        names, blobs = color_group_images(rng, per_group=4)
        ups = [UploadedImage(n, b) for n, b in zip(names, blobs)]
        res = pipe.run(ups, tmp_path.as_posix())
        got = {frozenset(c.images) for c in res.clusters.values()}
        want = {frozenset(n for n in names if n.startswith(g))
                for g in sorted({n.split("_")[0] for n in names})}
        assert got == want
        assert not res.dropped


class TestStructured:
    def test_obvious_blobs(self, rng):
        # 4 well-separated blobs of 5 -> exactly 4 clusters, one per blob
        centers = np.array([[0, 0], [40, 0], [0, 40], [40, 40]], np.float32)
        x = np.concatenate([
            c + rng.standard_normal((5, 2)).astype(np.float32) * 0.1
            for c in centers
        ])
        res = constrained_ward_chain(x, min_size=3, max_size=6)
        assert _partition(res) == {
            frozenset(f"img_{i}" for i in range(b * 5, b * 5 + 5))
            for b in range(4)
        }
