"""Constrained-Ward engine tests: oracle parity + constraint properties.

The oracle is a line-faithful NumPy transliteration of the reference
(/root/reference/internal/clustering/clustering.go); these tests lock the TPU
engine to its observable semantics (SURVEY.md §4 items 2-3).
"""

import numpy as np
import pytest

from imageclust_tpu.cluster import oracle
from imageclust_tpu.cluster.ward import (
    ConstraintError,
    calculate_optimal_clusters,
    constrained_ward,
)


class TestCalculateOptimalClusters:
    """Parity with clustering.go:168-186."""

    def test_matches_oracle_on_grid(self):
        for n in range(1, 60):
            for mn in range(1, 8):
                for mx in range(mn, 10):
                    try:
                        want = oracle.calculate_optimal_clusters(n, mn, mx)
                    except ValueError:
                        with pytest.raises(ConstraintError):
                            calculate_optimal_clusters(n, mn, mx)
                        continue
                    assert calculate_optimal_clusters(n, mn, mx) == want

    def test_reference_default(self):
        # n=10, (3,6): nmin=2, nmax=3 -> midpoint 2
        assert calculate_optimal_clusters(10, 3, 6) == 2

    def test_too_few_items(self):
        with pytest.raises(ConstraintError):
            calculate_optimal_clusters(2, 3, 6)

    def test_infeasible_band(self):
        # n=7, min=4, max=5: ceil(7/5)=2 > floor(7/4)=1
        with pytest.raises(ConstraintError):
            calculate_optimal_clusters(7, 4, 5)


def _oracle_map(x, ids, mn, mx):
    got, ok = oracle.perform_clustering_with_constraints(x, ids, mn, mx)
    assert ok
    return got


@pytest.mark.parametrize("update_rule", ["centroid", "lance_williams"])
class TestOracleParity:
    def test_blobs_exact_assignment(self, rng, blobs, update_rule):
        x = blobs(rng, n_blobs=6, per_blob=5, d=8)
        ids = [f"img_{i}" for i in range(len(x))]
        want = _oracle_map(x, ids, 3, 6)
        got = constrained_ward(x, ids, min_size=3, max_size=6,
                               update_rule=update_rule)
        assert got.cluster_map == want

    def test_random_data_parity(self, rng, update_rule):
        # Uniform random points: stresses tie-breaking and the maxSize
        # poisoning path far harder than blobs.
        for trial in range(5):
            x = (rng.random((24, 4)) * 4).astype(np.float32)
            ids = [f"it{i}" for i in range(len(x))]
            want = _oracle_map(x, ids, 2, 5)
            got = constrained_ward(x, ids, min_size=2, max_size=5,
                                   update_rule=update_rule)
            assert got.cluster_map == want, f"trial {trial}"

    def test_larger_job_partition(self, rng, update_rule):
        # 50 well-separated blobs of exactly 4 items: with (3,6) the midpoint
        # heuristic targets exactly 50 clusters, so membership is FP-robust
        # (ordering/numbering may differ by f32 reduction order across
        # backends — partition equality is the cross-backend contract).
        d = 16
        centers = rng.normal(size=(50, d)).astype(np.float32) * 30
        x = np.concatenate(
            [c + rng.normal(size=(4, d)).astype(np.float32) * 0.05
             for c in centers]
        )
        perm = rng.permutation(len(x))
        x = x[perm]
        ids = [f"img_{i}" for i in range(len(x))]
        want = _oracle_map(x, ids, 3, 6)
        got = constrained_ward(x, ids, min_size=3, max_size=6,
                               update_rule=update_rule)
        assert {frozenset(v) for v in got.cluster_map.values()} == {
            frozenset(v) for v in want.values()
        }
        assert got.dropped == []


class TestTieBreakParity:
    """Integer-grid data: every distance is exactly representable and the
    arithmetic is exact in f32, so the oracle and the engine must agree
    bit-for-bit INCLUDING cluster numbering — this pins the
    (birth_hi, birth_lo) tie-break to Go's scan order. Centroid mode only:
    Lance-Williams introduces divisions whose rounding legitimately differs
    from the reference's centroid recomputation."""

    def test_quantized_data_many_ties(self, rng):
        for trial in range(5):
            x = rng.integers(0, 3, size=(18, 3)).astype(np.float32)
            ids = [str(i) for i in range(len(x))]
            want = _oracle_map(x, ids, 2, 4)
            got = constrained_ward(x, ids, min_size=2, max_size=4,
                                   update_rule="centroid")
            assert got.cluster_map == want, f"trial {trial}"


class TestConstraintProperties:
    """Property tests derived from clustering.go:248-280."""

    @pytest.mark.parametrize("mn,mx", [(1, 3), (2, 4), (3, 6), (1, 1)])
    def test_size_bounds(self, rng, mn, mx):
        for _ in range(3):
            n = int(rng.integers(max(mn, 4), 40))
            try:
                calculate_optimal_clusters(n, mn, mx)
            except ConstraintError:
                continue
            x = rng.random((n, 5)).astype(np.float32)
            res = constrained_ward(x, min_size=mn, max_size=mx)
            for members in res.cluster_map.values():
                assert mn <= len(members) <= mx

    def test_partition_with_drops(self, rng):
        x = rng.random((25, 5)).astype(np.float32)
        ids = [f"i{k}" for k in range(25)]
        res = constrained_ward(x, ids, min_size=3, max_size=6)
        seen = [m for mem in res.cluster_map.values() for m in mem] + res.dropped
        assert sorted(seen) == sorted(ids)
        assert len(set(seen)) == 25

    def test_cluster_ids_sequential(self, rng):
        x = rng.random((30, 4)).astype(np.float32)
        res = constrained_ward(x, min_size=2, max_size=5)
        assert list(res.cluster_map.keys()) == list(range(len(res.cluster_map)))

    def test_raises_on_infeasible(self, rng):
        x = rng.random((2, 4)).astype(np.float32)
        with pytest.raises(ConstraintError):
            constrained_ward(x, min_size=3, max_size=6)

    def test_assignments_array(self, rng, blobs):
        x = blobs(rng, n_blobs=4, per_blob=5, d=8)
        res = constrained_ward(x, min_size=3, max_size=6)
        a = res.assignments()
        assert a.shape == (len(x),)
        for cid, members in res._index_map.items():
            assert all(a[m] == cid for m in members)

    def test_max_size_one(self, rng):
        # min=max=1: every item its own cluster, zero merges.
        x = rng.random((8, 3)).astype(np.float32)
        res = constrained_ward(x, min_size=1, max_size=1)
        assert len(res.cluster_map) == 8
        assert all(len(v) == 1 for v in res.cluster_map.values())


class TestMergeLog:
    def test_dendrogram_shape(self, rng, blobs):
        x = blobs(rng, n_blobs=4, per_blob=5, d=8)
        res = constrained_ward(x, min_size=3, max_size=6)
        merges = res.merges
        n = len(x)
        assert merges.shape[1] == 3
        # every merge consumes two live births and creates a fresh one
        created = set(range(n))
        for hi, lo, new in merges:
            assert int(hi) in created and int(lo) in created
            assert int(new) not in created
            assert hi > lo
            created.add(int(new))


class TestReassignDropped:
    def test_no_loss_with_reassignment(self, rng):
        x = rng.random((25, 5)).astype(np.float32)
        ids = [f"i{k}" for k in range(25)]
        base = constrained_ward(x, ids, min_size=3, max_size=6)
        res = constrained_ward(x, ids, min_size=3, max_size=6,
                               reassign_dropped=True)
        # everything the parity mode dropped is now placed (capacity allowing)
        placed = [m for v in res.cluster_map.values() for m in v]
        assert sorted(placed + res.dropped) == sorted(ids)
        assert len(res.dropped) <= len(base.dropped)
        for members in res.cluster_map.values():
            assert len(members) <= 6

    def test_parity_mode_unchanged_by_default(self, rng):
        x = rng.random((25, 5)).astype(np.float32)
        a = constrained_ward(x, min_size=3, max_size=6)
        b = constrained_ward(x, min_size=3, max_size=6)
        assert a.cluster_map == b.cluster_map and a.dropped == b.dropped


class TestSplitOversized:
    """splitCluster parity (clustering.go:295-349) — unreachable through the
    public path in both implementations, tested via the extracted helper
    against the oracle's transliteration."""

    def test_matches_oracle_split(self, rng, blobs):
        from imageclust_tpu.cluster.oracle import (
            _compute_initial_distance_matrix,
            _new_cluster,
            _split_cluster,
        )
        from imageclust_tpu.cluster.ward import split_oversized

        x = blobs(rng, n_blobs=3, per_blob=5, d=6)  # 15 points, max 4
        members = list(range(15))
        got = split_oversized(x, members, max_size=4)
        # oracle path
        parent = _new_cluster(0, x[0])
        parent.indices = members
        parent.size = len(members)
        subs = _split_cluster(parent, x, 4)
        for sc in subs:
            sc.indices = [members[k] for k in sc.indices]
        want = [sc.indices for sc in subs]
        assert got == want
        assert all(len(g) <= 4 for g in got)
        assert sorted(m for g in got for m in g) == members

    def test_remaps_global_indices(self, rng):
        from imageclust_tpu.cluster.ward import split_oversized

        x = rng.random((30, 4)).astype(np.float32)
        members = [3, 7, 11, 15, 19, 23, 27, 29]
        got = split_oversized(x, members, max_size=3)
        flat = sorted(m for g in got for m in g)
        assert flat == sorted(members)


class TestGraftEntryShape:
    def test_entry_is_jittable(self):
        import jax

        import __graft_entry__

        fn, (variables, blob) = __graft_entry__.entry()
        logits, pooled = jax.eval_shape(fn, variables, blob)
        assert logits.shape == (8, 1000)
        assert pooled.shape == (8, 2048)


class TestScipyCrossValidation:
    """Independent oracle: with constraints disabled (min=1, max=n) the
    engine must reproduce SciPy's Ward agglomeration — scipy's linkage
    distance is sqrt(2x) our WardDistance (a monotone transform, so merge
    order and partitions coincide on tie-free data)."""

    def test_partition_matches_scipy(self, rng, blobs):
        from scipy.cluster.hierarchy import fcluster, linkage

        x = blobs(rng, n_blobs=7, per_blob=6, d=8, spread=0.5)
        n = len(x)
        k = 7
        # our engine, unconstrained to target k
        from imageclust_tpu.cluster.ward import _run_merges

        clusters, _ = _run_merges(x, n_target=k, max_size=n,
                                  update_rule="centroid")
        ours = np.zeros(n, np.int64)
        for cid, members in enumerate(clusters):
            ours[members] = cid

        Z = linkage(x, method="ward")
        theirs = fcluster(Z, t=k, criterion="maxclust")

        # same partition up to label permutation
        pairs = {(a, b) for a in range(n) for b in range(a)
                 if ours[a] == ours[b]}
        pairs_scipy = {(a, b) for a in range(n) for b in range(a)
                       if theirs[a] == theirs[b]}
        assert pairs == pairs_scipy

    def test_merge_distances_match_scipy(self, rng):
        from scipy.cluster.hierarchy import linkage

        x = rng.normal(size=(40, 6)).astype(np.float32)
        from imageclust_tpu.cluster.ward import _run_merges

        # run to a single cluster and reconstruct our merge order
        clusters, log = _run_merges(x, n_target=1, max_size=40,
                                    update_rule="centroid")
        assert len(clusters) == 1
        Z = linkage(x, method="ward")
        # both produce n-1 merges; scipy's heights are sqrt(2 * ward_cost).
        # Reconstruct our merge costs by replaying sizes/centroids.
        sizes = {i: 1 for i in range(40)}
        cents = {i: x[i].astype(np.float64) for i in range(40)}
        our_heights = []
        for hi, lo, new in log:
            a, b = int(hi), int(lo)
            d = ((sizes[a] * sizes[b]) / (sizes[a] + sizes[b])) * float(
                ((cents[a] - cents[b]) ** 2).sum()
            )
            our_heights.append(np.sqrt(2.0 * d))
            sizes[new] = sizes[a] + sizes[b]
            cents[new] = (sizes[a] * cents[a] + sizes[b] * cents[b]) / sizes[new]
        np.testing.assert_allclose(
            sorted(our_heights), Z[:, 2], rtol=1e-4
        )
