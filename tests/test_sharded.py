"""Scalable bucketed engine + mesh sharding tests (SURVEY.md §5
"long-context" analog: sharding over n = image count)."""

import numpy as np
import pytest

from imageclust_tpu.cluster.sharded import constrained_ward_bucketed, kmeans
from imageclust_tpu.cluster.ward import ConstraintError


class TestKMeans:
    def test_separable(self, rng, blobs):
        import jax.numpy as jnp

        x = blobs(rng, n_blobs=4, per_blob=32, d=8)
        cents, assign, own_d, top_pref = kmeans(jnp.asarray(x), 4, iters=10)
        assign = np.asarray(assign)
        assert own_d.shape == (len(x),)
        assert top_pref.shape == (len(x), 4)
        # nearest-preference column 0 equals the assignment
        np.testing.assert_array_equal(np.asarray(top_pref)[:, 0], assign)
        # all four blobs recovered as distinct buckets
        assert len(set(assign.tolist())) == 4

    def test_subsampled_fit_engages_above_threshold(self, rng, monkeypatch):
        """Above the row threshold the Lloyd fit runs on a random subsample
        (one full-data assignment pass follows): same separable structure
        must still be recovered, and the full fit below the threshold is
        untouched (module constant gates it)."""
        import jax.numpy as jnp

        import imageclust_tpu.cluster.sharded as sh

        # unshuffled blobs (the fixture permutes rows): row block i = blob i
        centers = rng.normal(size=(4, 8)).astype(np.float32) * 10.0
        x = np.concatenate([
            c + rng.normal(size=(64, 8)).astype(np.float32) * 0.05
            for c in centers])
        calls = []
        orig = sh._kmeans_subsample

        def counting(xa, m, seed):
            calls.append(m)
            return orig(xa, m, seed)

        monkeypatch.setattr(sh, "_kmeans_subsample", counting)
        # default gate (1M rows): no subsample at this size
        kmeans(jnp.asarray(x), 4, iters=6)
        assert calls == []
        # drop the gate: fit on 4*fit_per_center rows, blobs still found
        monkeypatch.setattr(sh, "_KMEANS_SUBSAMPLE_MIN_N", 0)
        cents, assign, own_d, top_pref = kmeans(
            jnp.asarray(x), 4, iters=6, fit_per_center=16)
        assert calls == [64]
        # contract: full-data assignment pass (shapes cover every row)
        assert np.asarray(assign).shape == (256,)
        assert np.asarray(own_d).shape == (256,)
        np.testing.assert_array_equal(np.asarray(top_pref)[:, 0],
                                      np.asarray(assign))
        # locality: the fit is a heuristic (a 64-row sample may double-cover
        # a blob), but most blobs must still land in a single bucket —
        # capacity repair downstream absorbs the rest
        a = np.asarray(assign).reshape(4, 64)
        pure = sum(len(set(row.tolist())) == 1 for row in a)
        assert pure >= 3

    def test_need_only_prefs_match_full_matrix(self, rng):
        """_pref_need_rows (the need-only preference pass) must produce the
        exact rows the full-matrix top_k pass would have — same centroids,
        same tile geometry — for every residency dtype."""
        import jax.numpy as jnp

        import imageclust_tpu.cluster.sharded as sh

        n, d, k = 600, 16, 7
        base = rng.normal(size=(n, d)).astype(np.float32) * 3
        for dt in (jnp.float32, jnp.bfloat16, jnp.int8):
            if dt == jnp.int8:
                x = jnp.asarray(
                    np.clip(np.round(base * 10), -127, 127).astype(np.int8))
            else:
                x = jnp.asarray(base).astype(dt)
            cents, _, _, full = kmeans(x, k, iters=4)
            kk = int(full.shape[1])
            blk = sh._kmeans_block(n, k, sh._KMEANS_BLOCK)
            idx = rng.choice(n, size=137, replace=False).astype(np.int32)
            m_pad = -(-len(idx) // blk) * blk
            idx_pad = np.zeros(m_pad, np.int32)
            idx_pad[:len(idx)] = idx
            got = sh._pref_need_rows(x, cents, jnp.asarray(idx_pad),
                                     kk=kk, block=blk, as_u16=False)
            got_np = np.asarray(got)[:len(idx)]
            full_np = np.asarray(full)[idx]
            if np.array_equal(got_np, full_np):
                continue
            # Bitwise identity between the two differently-structured
            # compiled programs (gather- vs dynamic_slice-fed matmul) is
            # pinned only by current XLA CPU behavior — fusion may round
            # near-ties differently on an XLA upgrade (the _pref_need_rows
            # docstring says as much). Fall back to the semantic contract:
            # any disagreeing position must be a swap within distances that
            # are exactly tied at f32 resolution.
            cf = np.asarray(cents, np.float64)
            xf = np.asarray(x, np.float64)
            for r in np.nonzero((got_np != full_np).any(axis=1))[0]:
                d2 = ((xf[idx[r]] - cf) ** 2).sum(axis=1)
                d32 = d2.astype(np.float32)
                np.testing.assert_array_equal(
                    d32[got_np[r]], d32[full_np[r]],
                    err_msg="need-only row disagrees beyond tied distances")

    def test_need_only_engine_matches_full_pref_path(self, rng, monkeypatch):
        """The bucketed engine must produce identical clusters whether
        repair reads the full (n, 8) preference matrix or computes rows
        need-only (IMAGECLUST_PREF_NEED_ONLY) — skewed blobs force real
        spills and under-min dissolves through the preference logic."""
        centers = rng.normal(size=(6, 12)).astype(np.float32) * 8
        sizes = [160, 90, 40, 20, 6, 2]  # heavy skew: spills guaranteed
        x = np.concatenate([
            c + rng.normal(size=(s, 12)).astype(np.float32) * 0.5
            for c, s in zip(centers, sizes)])
        perm = rng.permutation(len(x))
        x = x[perm]
        ids = [f"i{k}" for k in range(len(x))]

        def run():
            return constrained_ward_bucketed(
                x, ids, min_size=3, max_size=6, bucket_size=16)

        monkeypatch.setenv("IMAGECLUST_PREF_NEED_ONLY", "0")
        full = run()
        monkeypatch.setenv("IMAGECLUST_PREF_NEED_ONLY", "1")
        need = run()
        assert need.cluster_map == full.cluster_map
        assert need.dropped == full.dropped


class TestBucketed:
    def test_size_bounds_and_partition(self, rng, blobs):
        x = blobs(rng, n_blobs=30, per_blob=8, d=8)
        ids = [f"i{k}" for k in range(len(x))]
        res = constrained_ward_bucketed(
            x, ids, min_size=3, max_size=6, bucket_size=64
        )
        for members in res.cluster_map.values():
            assert 3 <= len(members) <= 6
        seen = [m for v in res.cluster_map.values() for m in v] + res.dropped
        assert sorted(seen) == sorted(ids)

    def test_blob_purity(self, rng):
        # Well-separated blobs of exactly 4 points: with (min,max)=(3,6) the
        # reference's midpoint-k heuristic (clustering.go:168-186) targets
        # exactly one cluster per blob for any whole-blob bucket, so perfect
        # recovery is expected. (Blobs of other sizes make the heuristic
        # target a different k and legitimately split/drop — not a bug.)
        d = 8
        per = 4
        centers = rng.normal(size=(12, d)).astype(np.float32) * 50
        pts, want = [], []
        for bi, c in enumerate(centers):
            pts.append(c + rng.normal(size=(per, d)).astype(np.float32) * 0.01)
            want.append({f"b{bi}_{j}" for j in range(per)})
        x = np.concatenate(pts)
        ids = [f"b{bi}_{j}" for bi in range(12) for j in range(per)]
        # bucket_size=64 keeps capacity benign: bucketing may split blobs only
        # under capacity pressure (an accepted scalable-mode approximation,
        # exercised by test_size_bounds_and_partition instead).
        res = constrained_ward_bucketed(
            x, ids, min_size=3, max_size=6, bucket_size=64
        )
        got = {frozenset(v) for v in res.cluster_map.values()}
        assert got == {frozenset(w) for w in want}

    def test_small_falls_back_to_exact(self, rng, blobs):
        from imageclust_tpu.cluster.ward import constrained_ward

        x = blobs(rng, n_blobs=4, per_blob=5, d=8)
        ids = [f"i{k}" for k in range(len(x))]
        res = constrained_ward_bucketed(
            x, ids, min_size=3, max_size=6, bucket_size=1024
        )
        # the bucketed API's no-loss default carries through the fall-through
        exact = constrained_ward(x, ids, min_size=3, max_size=6,
                                 update_rule="lance_williams",
                                 reassign_dropped=True)
        assert res.cluster_map == exact.cluster_map
        # and with the parity flag it matches parity-mode exact
        res_p = constrained_ward_bucketed(
            x, ids, min_size=3, max_size=6, bucket_size=1024,
            reassign_dropped=False,
        )
        exact_p = constrained_ward(x, ids, min_size=3, max_size=6,
                                   update_rule="lance_williams")
        assert res_p.cluster_map == exact_p.cluster_map

    def test_infeasible_raises(self, rng):
        x = rng.random((2, 4)).astype(np.float32)
        with pytest.raises(ConstraintError):
            constrained_ward_bucketed(x, min_size=3, max_size=6)

    def test_on_mesh(self, rng, blobs, mesh8):
        x = blobs(rng, n_blobs=24, per_blob=8, d=8)
        ids = [f"i{k}" for k in range(len(x))]
        res = constrained_ward_bucketed(
            x, ids, min_size=3, max_size=6, bucket_size=32, mesh=mesh8
        )
        for members in res.cluster_map.values():
            assert 3 <= len(members) <= 6
        seen = [m for v in res.cluster_map.values() for m in v] + res.dropped
        assert sorted(seen) == sorted(ids)


class TestMesh:
    def test_create_mesh_axes(self, mesh8):
        assert mesh8.shape["data"] == 4
        assert mesh8.shape["model"] == 2

    def test_default_uses_all(self):
        from imageclust_tpu.core.mesh import create_mesh

        m = create_mesh()
        assert m.shape["data"] * m.shape["model"] == 8


class TestShardedExactMode:
    def test_mesh_exact_matches_single_device(self, rng, blobs, mesh8):
        from imageclust_tpu.cluster.ward import constrained_ward

        x = blobs(rng, n_blobs=8, per_blob=5, d=8)
        ids = [f"i{k}" for k in range(len(x))]
        single = constrained_ward(x, ids, min_size=3, max_size=6)
        sharded = constrained_ward(x, ids, min_size=3, max_size=6, mesh=mesh8)
        assert sharded.cluster_map == single.cluster_map
        assert sharded.dropped == single.dropped


class TestInitDistributed:
    def test_noop_without_coordinator(self, monkeypatch):
        from imageclust_tpu.core.mesh import init_distributed

        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
        assert init_distributed() is False


class TestAbsorbPhase:
    """VERDICT r1 item 4: the bucketed engine must not lose images. The
    on-device absorb phase merges under-min clusters into their Ward-nearest
    neighbor (bounded by max_size) inside the vmapped bucket loop."""

    def test_no_images_dropped(self, rng):
        from imageclust_tpu.cluster.sharded import constrained_ward_bucketed

        # awkward sizes that leave under-min stragglers in greedy Ward
        x = rng.normal(size=(400, 16)).astype(np.float32)
        res = constrained_ward_bucketed(
            x, min_size=3, max_size=6, bucket_size=64)
        placed = sum(len(m) for m in res.cluster_map.values())
        assert placed + len(res.dropped) == 400
        assert len(res.dropped) == 0
        # absorb never violates the max bound; min holds for every survivor
        for members in res.cluster_map.values():
            assert 3 <= len(members) <= 6

    def test_native_reconstruction_matches_python_walk(self, rng,
                                                       monkeypatch):
        # the C++ member expansion must be EXACTLY the python
        # children-dict/_leaf_indices walk: same cluster ids, same member
        # order (Go append order), same dropped list
        import imageclust_tpu.cluster.sharded as sh
        from imageclust_tpu.data.native import available

        if not available():
            pytest.skip("native lib not built (make -C native)")
        x = rng.normal(size=(700, 12)).astype(np.float32)
        fast = sh.constrained_ward_bucketed(
            x, min_size=3, max_size=6, bucket_size=48)
        monkeypatch.setattr(sh, "_native_reconstruction",
                            lambda *a: None)  # force the python walk
        ref = sh.constrained_ward_bucketed(
            x, min_size=3, max_size=6, bucket_size=48)
        assert fast.cluster_map == ref.cluster_map  # ids AND member order
        assert fast.dropped == ref.dropped
        np.testing.assert_array_equal(fast.merges, ref.merges)

    def test_bucket_chunking_matches_unchunked(self, rng, monkeypatch):
        # the chunked bucket dispatch (bounds the gathered working set so it
        # never mirrors the full feature matrix) must be result-identical
        # to one big vmap, including across a padded tail chunk
        import imageclust_tpu.cluster.sharded as sh

        x = rng.normal(size=(400, 8)).astype(np.float32)
        ref = sh.constrained_ward_bucketed(
            x, min_size=3, max_size=6, bucket_size=16)
        monkeypatch.setattr(sh, "_chunk_width", lambda *a: 8)
        got = sh.constrained_ward_bucketed(
            x, min_size=3, max_size=6, bucket_size=16)
        assert ({frozenset(m) for m in got.cluster_map.values()}
                == {frozenset(m) for m in ref.cluster_map.values()})
        assert got.dropped == ref.dropped
        np.testing.assert_array_equal(got.merges, ref.merges)

    def test_merges_form_global_dendrogram(self, rng):
        # review r2: per-bucket logs used bucket-LOCAL birth stamps, so the
        # concatenated merges field had colliding ids — it must be one
        # globally consistent dendrogram (leaves = item indices, internal
        # stamps unique past n, children defined before their parent)
        from imageclust_tpu.cluster.sharded import constrained_ward_bucketed

        n = 300
        x = rng.normal(size=(n, 8)).astype(np.float32)
        res = constrained_ward_bucketed(
            x, min_size=3, max_size=6, bucket_size=64)
        m = res.merges
        new = m[:, 2].tolist()
        assert len(set(new)) == len(new)
        assert (m[:, 2] >= n).all()
        alive = set(range(n))
        for hi, lo, nw in m:
            assert int(hi) in alive and int(lo) in alive
            alive.discard(int(hi))
            alive.discard(int(lo))
            alive.add(int(nw))

    def test_bucket_local_spill_never_crosses_buckets(self):
        # regression (review r2): with every own-bucket candidate masked to
        # +inf, top_k still returns positions — those must come back
        # invalid (-1), not as cross-bucket placements during the
        # bucket-LOCAL pass; the item falls through to the global pass
        import jax.numpy as jnp

        from imageclust_tpu.cluster.sharded import (
            _Clusters,
            _spill_bucket_local,
        )

        # bucket 0: cluster 0 near origin WITH room; bucket 1: full
        # cluster + a far dropped item at [100, 2]
        feats = jnp.asarray(np.array(
            [[0, 0], [0, 1], [1, 0],                     # cluster 0 (b0)
             [100, 0], [100, 1], [101, 0], [101, 1],     # cluster 1 (b1)
             [99, 0], [99, 1],                           # cluster 1 cont.
             [100, 2]], np.float32))                      # dropped (b1)
        buckets = [[0, 1, 2], [3, 4, 5, 6, 7, 8, 9]]
        cols = _Clusters.from_lists([[0, 1, 2], [3, 4, 5, 6, 7, 8]],
                                    bucket=[0, 1])
        still = _spill_bucket_local(feats, buckets, cols, [9], max_size=6)
        assert still == [9]           # own bucket full: NOT placed
        members, offsets = cols.finalize()
        assert members[offsets[0]:offsets[1]].tolist() == [0, 1, 2]
        # and not into the other bucket

    def test_absorb_off_is_parity_drop(self, rng):
        from imageclust_tpu.cluster.sharded import constrained_ward_bucketed

        x = rng.normal(size=(400, 16)).astype(np.float32)
        res_off = constrained_ward_bucketed(
            x, min_size=3, max_size=6, bucket_size=64,
            reassign_dropped=False)
        res_on = constrained_ward_bucketed(
            x, min_size=3, max_size=6, bucket_size=64,
            reassign_dropped=True)
        # absorb recovers at least what parity mode drops
        assert len(res_on.dropped) <= len(res_off.dropped)
        placed_on = sum(len(m) for m in res_on.cluster_map.values())
        assert placed_on + len(res_on.dropped) == 400

    def test_absorb_on_mesh(self, mesh8, rng):
        from imageclust_tpu.cluster.sharded import constrained_ward_bucketed

        x = rng.normal(size=(192, 8)).astype(np.float32)
        res = constrained_ward_bucketed(
            x, min_size=3, max_size=6, bucket_size=32, mesh=mesh8)
        assert len(res.dropped) == 0
        for members in res.cluster_map.values():
            assert 3 <= len(members) <= 6


class TestExactShardedLoop:
    """VERDICT r1 item 5: the exact engine's multi-chip mode must keep the
    n x n matrix row-sharded through the merge loop. Round 1's
    with_sharding_constraint version all-gathered the matrix every merge;
    the shard_map rewrite's per-merge communication is 3 scalar reductions
    plus one (n,) all_gather."""

    def test_mesh_equals_single_device_at_1k(self, mesh8, rng):
        from imageclust_tpu.cluster.ward import constrained_ward

        x = rng.normal(size=(1100, 24)).astype(np.float32)
        ids = [f"i{k}" for k in range(len(x))]
        for rule in ("lance_williams", "centroid"):
            a = constrained_ward(x, ids, min_size=3, max_size=6,
                                 update_rule=rule)
            b = constrained_ward(x, ids, min_size=3, max_size=6,
                                 update_rule=rule, mesh=mesh8)
            assert a.cluster_map == b.cluster_map, rule
            assert a.dropped == b.dropped, rule

    def test_no_quadratic_collectives_in_loop(self, mesh8):
        import re

        import jax.numpy as jnp

        from imageclust_tpu.cluster.ward import _sharded_merge_loop

        loop = _sharded_merge_loop(mesh8, "lance_williams")
        hlo = loop.lower(
            jnp.zeros((1024, 16)), jnp.int32(1000), jnp.int32(250),
            jnp.int32(6),
        ).compile().as_text()
        # no collective may move the (n, n) matrix
        assert not [
            l for l in hlo.splitlines()
            if re.search(r"(all-gather|all-to-all|collective-permute)", l)
            and "1024,1024" in l
        ]


class TestOwnerAlignedBuckets:
    """VERDICT r1 item 6: the mesh bucket engine must not replicate the
    feature matrix — rows move once to their bucket's owner via one
    all_to_all over row-sharded features."""

    def test_mesh_equals_single_device(self, mesh8, rng):
        x = rng.normal(size=(700, 16)).astype(np.float32)
        a = constrained_ward_bucketed(x, min_size=3, max_size=6,
                                      bucket_size=64)
        b = constrained_ward_bucketed(x, min_size=3, max_size=6,
                                      bucket_size=64, mesh=mesh8)
        assert a.cluster_map == b.cluster_map
        assert a.dropped == b.dropped

    def test_no_feature_replication_in_hlo(self, mesh8):
        import re

        import jax.numpy as jnp

        from imageclust_tpu.cluster.sharded import (
            _all_buckets_mesh, _plan_exchange)

        n, d, B = 512, 16, 64
        buckets = [list(range(i * 32, (i + 1) * 32)) for i in range(16)]
        send_idx, recv_pos, _ = _plan_exchange(buckets, n, 4, B)
        loop = _all_buckets_mesh(mesh8, "lance_williams", True, B)
        counts = jnp.full((16,), 32, jnp.int32)
        hlo = loop.lower(
            jnp.zeros((n, d)), jnp.asarray(send_idx), jnp.asarray(recv_pos),
            counts, jnp.full((16,), 8, jnp.int32),
            jnp.int32(6), jnp.int32(3),
        ).compile().as_text()
        # the (n, d) features may move via all-to-all only, never all-gather
        assert not [
            l for l in hlo.splitlines()
            if "all-gather" in l and f"{n},{d}" in l
        ]
        assert "all-to-all" in hlo


class TestColumnarResult:
    """VERDICT r2 item 5: the bucketed engine's result is columnar
    (members + offsets); cluster_map/dropped/_index_map are LAZY views so
    the 10M tier never pays dict-of-2M-lists construction unless asked."""

    def test_lazy_views_consistent(self, rng):
        from imageclust_tpu.cluster.sharded import constrained_ward_bucketed

        x = rng.normal(size=(300, 8)).astype(np.float32)
        ids = [f"it{i}" for i in range(300)]
        res = constrained_ward_bucketed(
            x, ids, min_size=3, max_size=6, bucket_size=64)
        # columnar accessors work WITHOUT materializing the dict
        assert res._cluster_map is None
        k = res.n_clusters
        assign = res.assignments()
        assert res._cluster_map is None
        # materialized views agree with the columnar data
        cmap = res.cluster_map
        assert len(cmap) == k
        for cid, members in res._index_map.items():
            assert [ids[m] for m in members] == cmap[cid]
            for m in members:
                assert assign[m] == cid
        placed = sum(len(m) for m in cmap.values())
        assert placed + len(res.dropped) == 300

    def test_finalize_append_order(self):
        from imageclust_tpu.cluster.sharded import _Clusters

        cols = _Clusters.from_lists([[5, 3], [9], [2, 7, 0]])
        cols.append(1, 11)
        cols.append(0, 12)
        cols.append(1, 13)
        members, offsets = cols.finalize()
        got = [members[offsets[c]:offsets[c + 1]].tolist()
               for c in range(cols.num)]
        # base segments keep order; appends follow in placement order
        assert got == [[5, 3, 12], [9, 11, 13], [2, 7, 0]]
        assert cols.sizes().tolist() == [3, 3, 3]

    def test_assign_array_includes_appends(self):
        from imageclust_tpu.cluster.sharded import _Clusters

        cols = _Clusters.from_lists([[0, 1], [2]])
        cols.append(0, 3)
        a = cols.assign_array(5)
        assert a.tolist() == [0, 0, 1, 0, -1]

    def test_result_requires_some_storage(self):
        import pytest as _pytest

        from imageclust_tpu.cluster.ward import ClusterResult

        with _pytest.raises(ValueError, match="cluster_map or"):
            ClusterResult(n_items=3)


class TestBf16Features:
    """VERDICT r2 item 6: bf16 feature residency halves the resident
    matrix (capacity envelope ~2e9 floats, 1.5M x 1000 on one chip);
    arithmetic still accumulates f32. Non-parity near ties, but on
    well-separated data the partition must not move."""

    def test_matches_f32_on_separated_blobs(self, rng, blobs):
        # whole-blob clusters (per_blob=4 <= max_size): recovery has no
        # near-tie splits, so bf16 rounding must not move the partition.
        # (per_blob > max_size would force splits on essentially-TIED
        # within-blob distances — exactly the caveated domain.)
        x = blobs(rng, n_blobs=24, per_blob=4, d=16)
        ids = [f"i{k}" for k in range(len(x))]
        f32 = constrained_ward_bucketed(
            x, ids, min_size=3, max_size=6, bucket_size=64)
        bf16 = constrained_ward_bucketed(
            x, ids, min_size=3, max_size=6, bucket_size=64,
            feature_dtype="bfloat16")
        assert ({frozenset(m) for m in bf16.cluster_map.values()}
                == {frozenset(m) for m in f32.cluster_map.values()})
        assert bf16.dropped == f32.dropped

    def test_resident_dtype_and_bounds(self, rng):
        import jax.numpy as jnp

        x = rng.normal(size=(400, 16)).astype(np.float32)
        res = constrained_ward_bucketed(
            x, min_size=3, max_size=6, bucket_size=64,
            feature_dtype="bfloat16")
        placed = sum(len(m) for m in res.cluster_map.values())
        assert placed + len(res.dropped) == 400
        assert len(res.dropped) == 0  # no-loss default holds in bf16 mode
        for members in res.cluster_map.values():
            assert 3 <= len(members) <= 6

    def test_unknown_dtype_rejected(self, rng):
        x = rng.normal(size=(32, 4)).astype(np.float32)
        with pytest.raises(ValueError, match="feature_dtype"):
            constrained_ward_bucketed(x, min_size=3, max_size=6,
                                      feature_dtype="fp8")

    def test_spill_centroids_bf16_accumulates_f32(self):
        import jax.numpy as jnp

        from imageclust_tpu.cluster.sharded import _spill_centroids

        rng = np.random.default_rng(3)
        n, d, c = 700, 8, 4
        feats = rng.normal(size=(n, d)).astype(np.float32)
        assign = rng.integers(0, c, n).astype(np.int32)
        sizes = np.bincount(assign, minlength=c).astype(np.int32)
        ref = np.asarray(_spill_centroids(
            jnp.asarray(feats), jnp.asarray(assign), jnp.asarray(sizes), c))
        got = np.asarray(_spill_centroids(
            jnp.asarray(feats).astype(jnp.bfloat16), jnp.asarray(assign),
            jnp.asarray(sizes), c))
        # blocked f32 accumulation: error bounded by the INPUT bf16
        # rounding alone, not by bf16 summation drift over 175-row segments
        np.testing.assert_allclose(got, ref, atol=2e-2, rtol=2e-2)

    def test_spill_centroids_bf16_slabbed(self, monkeypatch):
        """Force the multi-slab path (slab width 3, c_pad 7: a clamped
        partial final slab) and pin it against per-cluster numpy means —
        the path that replaces the (c_pad+1, d) f32 accumulator that OOMed
        the 10M x 512 tier."""
        import jax.numpy as jnp

        import imageclust_tpu.cluster.sharded as sh

        monkeypatch.setattr(sh, "_SPILL_CENT_SLAB", 3)
        rng = np.random.default_rng(5)
        n, d, c_pad, c_live = 200, 8, 7, 6
        feats = rng.normal(size=(n, d)).astype(np.float32)
        assign = rng.integers(-1, c_live, n).astype(np.int32)  # -1 = dropped
        sizes = np.zeros(c_pad, np.int32)
        for a in assign:
            if a >= 0:
                sizes[a] += 1
        got = np.asarray(sh._spill_centroids(
            jnp.asarray(feats).astype(jnp.bfloat16), jnp.asarray(assign),
            jnp.asarray(sizes), c_pad), dtype=np.float32)
        assert got.shape == (c_pad, d)
        for ci in range(c_live):
            mask = assign == ci
            ref = feats[mask].mean(axis=0)
            np.testing.assert_allclose(got[ci], ref, atol=2e-2, rtol=2e-2)
        np.testing.assert_array_equal(got[c_live:], 0.0)  # empty clusters


class TestHostTailHelpers:
    """Direct pins for the 10M-tier host-side helpers: the compact-first
    restamp and the chunked-vectorized capacity repair must stay
    bit-identical to their straightforward sequential definitions."""

    def test_restamp_logs_matches_per_bucket_loop(self):
        from imageclust_tpu.cluster.sharded import _restamp_logs

        rng = np.random.default_rng(11)
        for _ in range(10):
            nb = int(rng.integers(1, 6))
            bucket_size = int(rng.integers(2, 12))
            n = nb * bucket_size + int(rng.integers(0, 5))
            L = bucket_size - 1
            counts = rng.integers(1, bucket_size + 1, nb).astype(np.int32)
            steps = np.array([rng.integers(0, c) for c in counts],
                             np.int32)
            logs = np.zeros((nb, max(L, 1), 3), np.int32)
            for b in range(nb):
                for r in range(steps[b]):
                    hi = counts[b] + r
                    logs[b, r, 0] = rng.integers(0, hi)
                    logs[b, r, 1] = rng.integers(0, hi)
            bucket_idx = rng.integers(0, n, (nb, bucket_size)).astype(
                np.int32)

            # reference: sequential per-bucket restamp
            ref_rows = []
            base = n
            for b in range(nb):
                for r in range(steps[b]):
                    row = []
                    for c in range(2):
                        v = int(logs[b, r, c])
                        if v < counts[b]:
                            row.append(int(bucket_idx[b, v]))
                        else:
                            row.append(base + (v - int(counts[b])))
                    row.append(base + r)
                    ref_rows.append(row)
                base += int(steps[b])
            ref = (np.asarray(ref_rows, np.int32) if ref_rows
                   else np.zeros((0, 3), np.int32))
            got = _restamp_logs(logs, steps, counts, bucket_idx, n)
            np.testing.assert_array_equal(got, ref)

    def test_repair_buckets_matches_sequential(self):
        """The chunked bulk placement (guard + bisected replay) must place
        every spill item into exactly the bucket the per-item scan picks;
        forcing tiny chunks exercises the replay and grouping paths."""
        import imageclust_tpu.cluster.sharded as sh

        def reference(assign, own_d, top_pref, n_buckets, capacity,
                      min_size):
            buckets = [[] for _ in range(n_buckets)]
            for i, a in enumerate(assign):
                buckets[int(a)].append(i)

            def place(i, avoid, pred):
                for nb in top_pref[i]:
                    nb = int(nb)
                    if nb != avoid and pred(buckets[nb]):
                        buckets[nb].append(i)
                        return True
                for nb in range(n_buckets):
                    if nb != avoid and pred(buckets[nb]):
                        buckets[nb].append(i)
                        return True
                return False

            cursor = 0
            for b in range(n_buckets):
                if len(buckets[b]) <= capacity:
                    continue
                members = sorted(buckets[b], key=lambda i: own_d[i])
                buckets[b], spill = members[:capacity], members[capacity:]
                for i in spill:
                    placed = False
                    for nb in top_pref[i]:
                        nb = int(nb)
                        if nb != b and len(buckets[nb]) < capacity:
                            buckets[nb].append(i)
                            placed = True
                            break
                    if not placed:
                        while (cursor < n_buckets
                               and len(buckets[cursor]) >= capacity):
                            cursor += 1
                        if cursor < n_buckets:
                            buckets[cursor].append(i)
                        else:
                            buckets[b].append(i)
            for _ in range(n_buckets):
                changed = False
                for b in range(n_buckets):
                    if 0 < len(buckets[b]) < min_size:
                        members, buckets[b] = buckets[b], []
                        for i in members:
                            if not place(
                                    i, b,
                                    lambda l: min_size <= len(l) < capacity):
                                if not place(
                                        i, b,
                                        lambda l: 0 < len(l) < capacity):
                                    buckets[b].append(i)
                        if not buckets[b]:
                            changed = True
                if not changed:
                    break
            return [b for b in buckets if b]

        rng = np.random.default_rng(7)
        for trial in range(12):
            n = int(rng.integers(40, 1500))
            nb = int(rng.integers(2, 30))
            cap = int(rng.integers(3, 25))
            mn = int(rng.integers(1, max(2, cap // 2)))
            w = rng.lognormal(0, rng.uniform(0.3, 2.0), nb)
            assign = rng.choice(nb, size=n, p=w / w.sum()).astype(np.int32)
            own_d = rng.random(n).astype(np.float32)
            top_pref = rng.integers(
                0, nb, (n, int(rng.integers(1, 6)))).astype(np.int32)
            ref = reference(assign, own_d, top_pref, nb, cap, mn)
            got = sh._repair_buckets(assign, own_d, top_pref, nb, cap, mn)
            assert got == ref, f"trial {trial}"

    def test_repair_device_summaries_match_oracle(self):
        """_repair_buckets_device (on-device counts/rank + sparse
        preference fetch) must be placement-identical to the host oracle
        — fixtures include own_d TIES (the stable-sort tie-break must
        match) and heavy skew (so over-capacity spills, the cursor
        fallback, and under-min dissolves all fire). The uint16 rank and
        pref branches are the ones a realistic nb < 64k run takes; the
        int64-rank logic is what the oracle itself runs."""
        import jax.numpy as jnp

        import imageclust_tpu.cluster.sharded as sh

        rng = np.random.default_rng(5)
        for trial in range(6):
            n = int(rng.integers(500, 5000))
            nb = int(rng.integers(8, 60))
            cap = int(rng.integers(4, 24))
            mn = int(rng.integers(1, max(2, cap // 3)))
            w = rng.lognormal(0, 1.5, nb)
            assign = rng.choice(nb, size=n, p=w / w.sum()).astype(np.int32)
            own_d = rng.random(n).astype(np.float32)
            own_d[rng.random(n) < 0.3] = 0.5  # exercise tie-breaks
            top_pref = rng.integers(0, nb, (n, 6)).astype(np.int32)
            ref = sh._repair_buckets(assign, own_d, top_pref, nb, cap, mn)
            got = sh._repair_buckets_device(
                jnp.asarray(assign), jnp.asarray(own_d),
                jnp.asarray(top_pref), nb, cap, mn)
            # the device path's fast repair returns np.ndarray blocks
            got = [[int(i) for i in b] for b in got]
            assert got == ref, f"trial {trial}"

    def test_repair_fast_array_path_matches_list_oracle(self):
        """_repair_from_summaries_fast (array bookkeeping, native
        placement) must reproduce _repair_from_summaries (list oracle)
        member-for-member IN ORDER — overflow keeps in rank order,
        placements in stable target-grouped order, dissolve appends in
        processing order. Fixtures push every branch: heavy skew (mass
        spills + cursor fallback), own_d ties, under-min tails, and
        hot-bucket preference contention."""
        import imageclust_tpu.cluster.sharded as sh
        from imageclust_tpu.data import native as dn

        if not dn.available():
            pytest.skip("native runtime not built (fast path disabled)")
        rng = np.random.default_rng(23)
        for trial in range(14):
            n = int(rng.integers(200, 8000))
            nb = int(rng.integers(4, 80))
            cap = int(rng.integers(3, 30))
            mn = int(rng.integers(1, max(2, cap // 2)))
            w = rng.lognormal(0, rng.uniform(0.3, 2.5), nb)
            assign = rng.choice(nb, size=n, p=w / w.sum()).astype(np.int32)
            own_d = rng.random(n).astype(np.float32)
            own_d[rng.random(n) < 0.4] = 0.25  # tie-break coverage
            kk = int(rng.integers(1, 8))
            if trial % 2:  # contended: prefs point at the popular buckets
                hot = np.argsort(-w)[: max(2, nb // 4)]
                top_pref = hot[rng.integers(0, len(hot), (n, kk))]
                top_pref = top_pref.astype(np.int32)
            else:
                top_pref = rng.integers(0, nb, (n, kk)).astype(np.int32)
            counts0 = np.bincount(assign, minlength=nb).astype(np.int64)
            perm = np.lexsort((own_d, assign))
            offs0 = np.concatenate([[0], np.cumsum(counts0[:-1])])
            rank = np.empty(n, np.int64)
            rank[perm] = np.arange(n) - np.repeat(offs0, counts0)
            ref = sh._repair_from_summaries(
                assign, rank, counts0.copy(), top_pref, nb, cap, mn)
            got = sh._repair_from_summaries_fast(
                assign, rank, counts0.copy(), top_pref, nb, cap, mn)
            assert got is not None
            assert [[int(i) for i in b] for b in got] == ref, \
                f"trial {trial}"

    def test_repair_native_and_python_paths_agree(self, monkeypatch):
        """The native C placement loop (ic_spill_place) and the chunked
        numpy fallback must produce identical repair output — fixture
        built contended (preferences concentrate on the popular, already
        full buckets) so both the bulk-guard failures and the cursor
        fallback fire."""
        import imageclust_tpu.cluster.sharded as sh
        from imageclust_tpu.data import native as dn

        if not dn.available():
            pytest.skip("native runtime not built")
        rng = np.random.default_rng(11)
        fixtures = []
        for _ in range(6):
            n = int(rng.integers(300, 3000))
            nb = int(rng.integers(8, 40))
            cap = int(rng.integers(4, 20))
            mn = int(rng.integers(1, max(2, cap // 3)))
            w = rng.lognormal(0, 1.5, nb)
            p = w / w.sum()
            assign = rng.choice(nb, size=n, p=p).astype(np.int32)
            hot = np.argsort(-w)[: max(2, nb // 4)]
            top_pref = hot[rng.integers(0, len(hot), (n, 6))].astype(
                np.int32)
            own_d = rng.random(n).astype(np.float32)
            fixtures.append((assign, own_d, top_pref, nb, cap, mn))
        with_native = [sh._repair_buckets(*f) for f in fixtures]
        monkeypatch.setattr(dn, "native_spill_place",
                            lambda *a, **k: None)
        pure_python = [sh._repair_buckets(*f) for f in fixtures]
        assert with_native == pure_python


class TestSpillCandidatesLocal:
    def test_local_candidates_match_masked_global(self):
        """_spill_candidates_local (gather only the item's own bucket's
        cluster centroids) must surface the same candidate SET as the
        retired mask-the-global-tile formulation: same-bucket clusters
        with room, nearest first, -1 for invalid slots."""
        import jax.numpy as jnp

        from imageclust_tpu.cluster import sharded as sh

        rng = np.random.default_rng(3)
        n, d, n_c, nb, k, max_size = 60, 5, 12, 4, 4, 7
        feats = rng.normal(size=(n, d)).astype(np.float32)
        cents = rng.normal(size=(n_c, d)).astype(np.float32)
        sizes = rng.integers(1, max_size + 1, n_c).astype(np.int32)
        cluster_bucket = rng.integers(0, nb, n_c).astype(np.int32)
        drop = rng.choice(n, 8, replace=False).astype(np.int32)
        item_bucket = rng.integers(0, nb, len(drop)).astype(np.int32)

        order = np.argsort(cluster_bucket, kind="stable")
        counts_b = np.bincount(cluster_bucket, minlength=nb)
        mc = max(1, int(counts_b.max()))
        table = np.full((nb, mc), -1, np.int32)
        table[cluster_bucket[order], sh._ranges(counts_b)] = order

        got = np.asarray(sh._spill_candidates_local(
            jnp.asarray(feats), jnp.asarray(cents), jnp.asarray(sizes),
            jnp.asarray(drop), jnp.asarray(item_bucket),
            jnp.asarray(table), k, jnp.int32(max_size)))

        for r, (i, bi) in enumerate(zip(drop, item_bucket)):
            d2 = ((feats[i].astype(np.float64)
                   - cents.astype(np.float64)) ** 2).sum(axis=1)
            valid = (cluster_bucket == bi) & (sizes < max_size)
            want = set(np.flatnonzero(valid).tolist())
            got_row = [c for c in got[r] if c >= 0]
            assert set(got_row) <= want
            # nearest-first over the valid set, as many as fit in k slots
            ranked = sorted(want, key=lambda c: d2[c])[:len(got_row)]
            assert len(got_row) == min(len(want), min(k, mc))
            got_d = [d2[c] for c in got_row]
            assert got_d == sorted(got_d)
            assert set(got_row) == set(ranked) or np.allclose(
                sorted(d2[c] for c in got_row),
                sorted(d2[c] for c in ranked))


class TestInt8Residency:
    """feature_dtype="int8": features quantize once to a symmetric grid
    whose global scale cancels out of Ward's merge order (sharded.py
    _feat_int8) — capacity doubles again over bf16. On well-separated data
    the partition must not move; on the grid itself the engine must be
    scale-transparent (pre-quantized int8 in == internal quantization)."""

    def test_matches_f32_on_separated_blobs(self, rng, blobs):
        x = blobs(rng, n_blobs=24, per_blob=4, d=16)
        ids = [f"i{k}" for k in range(len(x))]
        f32 = constrained_ward_bucketed(
            x, ids, min_size=3, max_size=6, bucket_size=64)
        i8 = constrained_ward_bucketed(
            x, ids, min_size=3, max_size=6, bucket_size=64,
            feature_dtype="int8")
        assert ({frozenset(m) for m in i8.cluster_map.values()}
                == {frozenset(m) for m in f32.cluster_map.values()})
        assert i8.dropped == f32.dropped

    def test_pre_quantized_input_is_passthrough(self, rng, blobs):
        import jax.numpy as jnp

        x = blobs(rng, n_blobs=12, per_blob=4, d=8).astype(np.float32)
        import imageclust_tpu.cluster.sharded as sh

        q = np.asarray(sh._feat_int8(jnp.asarray(x)))
        assert q.dtype == np.int8
        a = constrained_ward_bucketed(
            x, min_size=3, max_size=6, bucket_size=32, feature_dtype="int8")
        b = constrained_ward_bucketed(
            q, min_size=3, max_size=6, bucket_size=32, feature_dtype="int8")
        assert ({frozenset(m) for m in a.cluster_map.values()}
                == {frozenset(m) for m in b.cluster_map.values()})

    def test_quantizer_grid(self):
        import jax.numpy as jnp
        import imageclust_tpu.cluster.sharded as sh

        x = np.array([[0.0, 1.0], [-2.0, 0.5]], np.float32)
        q = np.asarray(sh._feat_int8(jnp.asarray(x)))
        # absmax 2.0 -> scale 2/127; values round to the grid
        np.testing.assert_array_equal(
            q, np.array([[0, 64], [-127, 32]], np.int8))

    def test_no_loss_and_bounds(self, rng):
        x = rng.normal(size=(400, 16)).astype(np.float32)
        res = constrained_ward_bucketed(
            x, min_size=3, max_size=6, bucket_size=64, feature_dtype="int8")
        placed = sum(len(m) for m in res.cluster_map.values())
        assert placed + len(res.dropped) == 400
        assert len(res.dropped) == 0
        for members in res.cluster_map.values():
            assert 3 <= len(members) <= 6

    def test_exact_fallback_single_bucket(self, rng, blobs):
        # n small enough for one bucket: the exact engine gets f32-cast
        # grid values
        x = blobs(rng, n_blobs=4, per_blob=4, d=8)
        res = constrained_ward_bucketed(
            x, min_size=3, max_size=6, bucket_size=256,
            feature_dtype="int8")
        assert sum(len(m) for m in res.cluster_map.values()) == len(x)

    def test_spill_centroids_int8_slab_path(self):
        import jax.numpy as jnp
        import imageclust_tpu.cluster.sharded as sh

        rng = np.random.default_rng(3)
        x = rng.integers(-127, 128, (50, 8)).astype(np.int8)
        assign = rng.integers(-1, 6, 50).astype(np.int32)  # -1 = dump
        sizes = np.bincount(assign[assign >= 0], minlength=8).astype(np.int32)
        cents = np.asarray(sh._spill_centroids(
            jnp.asarray(x), jnp.asarray(assign), jnp.asarray(sizes), 8))
        # int8 routes through the slab path -> grid-rounded int8 centroids
        # (half the (c_pad, d) bytes of bf16 at the 10M x 1024 tier)
        assert cents.dtype == np.int8
        for c in range(6):
            m = assign == c
            if m.any():
                want = x[m].astype(np.float64).mean(0)
                got = cents[c].astype(np.float64)
                np.testing.assert_allclose(got, want, atol=0.501)

    def test_int8_gram_is_exact_integer_arithmetic(self):
        import jax.numpy as jnp
        import imageclust_tpu.cluster.sharded as sh

        rng = np.random.default_rng(5)
        rows = rng.integers(-127, 128, (64, 48)).astype(np.int8)
        cents = rng.integers(-127, 128, (16, 48)).astype(np.int8)
        got = np.asarray(sh._sqdist_tile(jnp.asarray(rows),
                                         jnp.asarray(cents)))
        want = ((rows.astype(np.int64)[:, None, :]
                 - cents.astype(np.int64)[None, :, :]) ** 2).sum(-1)
        np.testing.assert_array_equal(got.astype(np.int64), want)

    def test_int8_gram_quantizes_f32_centroids_to_grid(self):
        import jax.numpy as jnp
        import imageclust_tpu.cluster.sharded as sh

        rng = np.random.default_rng(6)
        rows = rng.integers(-127, 128, (32, 8)).astype(np.int8)
        cents = rng.uniform(-100, 100, (4, 8)).astype(np.float32)
        got = np.asarray(sh._sqdist_tile(jnp.asarray(rows),
                                         jnp.asarray(cents)))
        c8 = np.clip(np.round(cents), -127, 127)
        want = ((rows.astype(np.float64)[:, None, :]
                 - c8.astype(np.float64)[None, :, :]) ** 2).sum(-1)
        np.testing.assert_allclose(got, want, rtol=1e-6)


class TestSpillMemberTable:
    """Member-table spill centroids: per round, ONE gather+reduce stream
    over the feature matrix replaces the slab path's n_slabs full-matrix
    segment-sum scans, with the assignment crossing the link once per
    phase. Per-cluster accumulation order is the table's member order —
    exact wherever sums are exactly representable (the int8 grid; integer
    bf16 data), the documented near-tie envelope otherwise."""

    def test_member_table_reconstructs_membership(self):
        import jax.numpy as jnp

        from imageclust_tpu.cluster.sharded import _spill_member_table

        rng = np.random.default_rng(11)
        n, c_pad, ms = 300, 8, 64
        assign = rng.integers(-1, 6, n).astype(np.int32)  # -1 = unplaced
        table, counts = _spill_member_table(jnp.asarray(assign), c_pad, ms)
        table = np.asarray(table)
        counts = np.asarray(counts)
        assert table.shape == (c_pad, ms)
        for c in range(c_pad):
            want = np.flatnonzero(assign == c)
            assert counts[c] == len(want)
            got = table[c][table[c] < n]
            np.testing.assert_array_equal(np.sort(got), want)
            # members ascend (stable sort) and padding is the sentinel
            np.testing.assert_array_equal(got, want)
            assert (table[c][len(want):] == n).all()

    def test_cent_table_matches_slab_path_exactly_on_grids(self):
        """Integer-valued bf16 features: every per-cluster sum is exactly
        representable, so the table path must equal the slab segment-sum
        bit for bit (order-independence of exact sums)."""
        import jax.numpy as jnp

        from imageclust_tpu.cluster.sharded import (
            _cent_norms, _spill_centroids, _spill_cent_table,
            _spill_member_table)

        rng = np.random.default_rng(12)
        n, d, c_pad, ms = 500, 16, 16, 8
        feats = jnp.asarray(
            rng.integers(-8, 9, (n, d)).astype(np.float32)
        ).astype(jnp.bfloat16)
        assign = rng.permutation(
            np.repeat(np.arange(12, dtype=np.int32), ms - 2))
        assign = np.concatenate(
            [assign, np.full(n - len(assign), -1, np.int32)])
        sizes = np.zeros(c_pad, np.int32)
        for a in assign:
            if a >= 0:
                sizes[a] += 1
        ref = _spill_centroids(
            feats, jnp.asarray(assign), jnp.asarray(sizes), c_pad)
        ref_norms = _cent_norms(ref)
        table, counts = _spill_member_table(jnp.asarray(assign), c_pad, ms)
        got, norms = _spill_cent_table(feats, table, counts, c_pad)
        np.testing.assert_array_equal(
            np.asarray(got, np.float32), np.asarray(ref, np.float32))
        np.testing.assert_array_equal(np.asarray(norms), np.asarray(ref_norms))

    def test_cent_table_matches_slab_path_int8(self):
        import jax.numpy as jnp

        from imageclust_tpu.cluster.sharded import (
            _cent_norms, _spill_centroids, _spill_cent_table,
            _spill_member_table)

        rng = np.random.default_rng(13)
        n, d, c_pad, ms = 400, 8, 8, 6
        feats = jnp.asarray(rng.integers(-127, 128, (n, d)), jnp.int8)
        assign = rng.integers(0, 7, n).astype(np.int32)
        sizes = np.bincount(assign, minlength=c_pad).astype(np.int32)
        ref = _spill_centroids(
            feats, jnp.asarray(assign), jnp.asarray(sizes), c_pad)
        table, counts = _spill_member_table(
            jnp.asarray(assign), c_pad, 128)  # ms > max cluster count
        got, norms = _spill_cent_table(feats, table, counts, c_pad)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        np.testing.assert_array_equal(
            np.asarray(norms), np.asarray(_cent_norms(ref)))

    def test_table_append_matches_rebuild(self):
        """Delta scatters land appended members at the end slots; the
        resulting membership equals a fresh table from the updated
        assignment (as sets; slot order is sorted-base-then-appends)."""
        import jax.numpy as jnp

        from imageclust_tpu.cluster.sharded import (
            _spill_member_table, _spill_table_append)

        rng = np.random.default_rng(14)
        n, c_pad, ms = 100, 4, 8
        assign = rng.integers(-1, 3, n).astype(np.int32)
        table, counts = _spill_member_table(jnp.asarray(assign), c_pad, ms)
        # place 3 unassigned items into cluster 3 (empty so far)
        free = np.flatnonzero(assign < 0)[:3]
        rows = jnp.asarray(np.array([3, 3, 3], np.int32))
        slots = jnp.asarray(np.array([0, 1, 2], np.int32))
        items = jnp.asarray(free.astype(np.int32))
        table, counts = _spill_table_append(table, counts, rows, slots,
                                            items)
        assign2 = assign.copy()
        assign2[free] = 3
        want_t, want_c = _spill_member_table(jnp.asarray(assign2), c_pad, ms)
        np.testing.assert_array_equal(np.asarray(counts),
                                      np.asarray(want_c))
        t, w = np.asarray(table), np.asarray(want_t)
        for c in range(c_pad):
            np.testing.assert_array_equal(np.sort(t[c][t[c] < n]),
                                          np.sort(w[c][w[c] < n]))

    def test_engine_table_vs_slab_partitions_on_grid(self, monkeypatch):
        """End to end: bf16 residency on an integer grid (exact sums ->
        both spill-centroid paths identical), with data shaped to force
        spill rounds. Partitions must match exactly."""
        from imageclust_tpu.cluster.sharded import constrained_ward_bucketed

        rng = np.random.default_rng(15)
        x = rng.integers(-6, 7, (500, 16)).astype(np.float32)
        outs = {}
        for flag in ("0", "1"):
            monkeypatch.setenv("IMAGECLUST_SPILL_TABLE", flag)
            res = constrained_ward_bucketed(
                x, min_size=3, max_size=6, bucket_size=64,
                feature_dtype="bfloat16")
            assert len(res.dropped) == 0
            outs[flag] = {k: tuple(sorted(v))
                          for k, v in res.cluster_map.items()}
        assert set(outs["0"].values()) == set(outs["1"].values())


class TestDeviceSpillPlace:
    """_device_spill_place (deferred acceptance on device) must equal the
    serial first-fit loop (native ic_spill_place) wherever no item
    exhausts its preference list — and must raise the not-ok flag exactly
    when one does (the serial monotone-cursor fallback interleaves with
    placements, which rounds cannot reproduce; the caller then replays on
    the host)."""

    @staticmethod
    def _host_oracle(assign, rank, counts, prefs, capacity):
        """Serial first-fit in pure Python over the (bucket asc, rank asc)
        spill order; returns (spill_items, into, used_cursor_fallback)."""
        spill = np.flatnonzero((counts[assign] > capacity)
                               & (rank >= capacity))
        order = spill[np.lexsort((rank[spill], assign[spill]))]
        cnt = np.minimum(counts, capacity).astype(np.int64)
        into = np.empty(len(order), np.int64)
        fallback = False
        cursor = 0
        nb = len(counts)
        for t, i in enumerate(order):
            chosen = -1
            for b in prefs[i]:
                if b != assign[i] and cnt[b] < capacity:
                    chosen = b
                    break
            if chosen < 0:
                fallback = True
                while cursor < nb and cnt[cursor] >= capacity:
                    cursor += 1
                chosen = cursor if cursor < nb else assign[i]
            cnt[chosen] += 1
            into[t] = chosen
        return order, into, fallback

    def _instance(self, rng, n=150, nb=24, capacity=8, kk=4):
        import jax.numpy as jnp

        import imageclust_tpu.cluster.sharded as sh

        assign = rng.integers(0, nb, n).astype(np.int32)
        own = rng.integers(0, 1000, n).astype(np.float32)
        counts, rank_d, _, _ = sh._repair_summaries(
            jnp.asarray(assign), jnp.asarray(own), nb,
            np.int32(capacity), np.int32(2))
        counts = np.asarray(counts)
        rank = np.asarray(rank_d)
        prefs = np.stack([
            rng.choice(nb, size=kk, replace=False) for _ in range(n)
        ]).astype(np.int32)
        return assign, rank, counts, prefs

    def test_matches_serial_first_fit_fuzz(self, rng):
        import jax.numpy as jnp

        import imageclust_tpu.cluster.sharded as sh

        full = 0
        partial = 0
        # 12 roomy instances (full-device path) + 4 tight ones (pref
        # exhaustion -> prefix validity)
        cases = [(s, 150) for s in range(12)] + \
                [(100 + s, 260) for s in range(4)]
        for seed, n_items in cases:
            r = np.random.default_rng(seed)
            assign, rank, counts, prefs = self._instance(r, n=n_items)
            order, want, fb = self._host_oracle(
                assign, rank, counts, prefs, 8)
            into, n_spill, first_bad = sh._device_spill_place(
                jnp.asarray(assign), jnp.asarray(rank),
                jnp.asarray(counts), jnp.asarray(prefs), jnp.int32(8),
                m_pad=512)
            assert int(n_spill) == len(order)
            fb_dev = int(first_bad)
            if fb:
                # exhaustion: first_bad marks it, and the VALIDATED
                # PREFIX must still equal the serial outcome
                assert fb_dev < len(order)
                np.testing.assert_array_equal(
                    np.asarray(into)[:fb_dev], want[:fb_dev])
                partial += 1
                continue
            assert fb_dev == len(order)
            full += 1
            np.testing.assert_array_equal(
                np.asarray(into)[:len(order)], want)
        assert full >= 6  # the fuzz must exercise the full-device path
        assert partial >= 1  # ... and the prefix-validity claim

    def test_exhaustion_flagged(self, rng):
        import jax.numpy as jnp

        import imageclust_tpu.cluster.sharded as sh

        # two buckets: bucket 0 holds 6 items (capacity 2 -> 4 spill), all
        # of whose prefs point ONLY at bucket 1 (capacity 2, full after 2
        # placements) or back at bucket 0 -> two items must exhaust
        assign = np.array([0] * 6 + [1] * 2, np.int32)
        own = np.arange(8).astype(np.float32)
        counts, rank_d, _, _ = sh._repair_summaries(
            jnp.asarray(assign), jnp.asarray(own), 2,
            np.int32(2), np.int32(1))
        prefs = np.tile(np.array([[1, 0]], np.int32), (8, 1))
        into, n_spill, first_bad = sh._device_spill_place(
            jnp.asarray(assign), jnp.asarray(np.asarray(rank_d)),
            jnp.asarray(np.asarray(counts)), jnp.asarray(prefs),
            jnp.int32(2), m_pad=8)
        assert int(n_spill) == 4
        # bucket 1 holds 2 pre-existing members (capacity 2): NO spill
        # item can place -> the validated prefix is empty
        assert int(first_bad) == 0

    def test_engine_identical_with_device_place(self, rng, monkeypatch):
        """Full bucketed run on integer-grid blobs: summarize-fused +
        device placement vs the all-host path — identical partitions,
        drops, and merges (skewed sizes force spills + dissolves, so both
        the placement and the family fetch actually run)."""
        import imageclust_tpu.cluster.sharded as sh

        r = np.random.default_rng(7)
        centers = (r.integers(-5, 6, (6, 12)) * 8).astype(np.float32)
        sizes = [160, 90, 40, 20, 6, 2]
        x = np.concatenate([
            c + r.integers(-2, 3, (s, 12)).astype(np.float32)
            for c, s in zip(centers, sizes)])
        x = x[r.permutation(len(x))]
        monkeypatch.setenv("IMAGECLUST_SUMMARIZE_FUSED", "0")
        monkeypatch.setenv("IMAGECLUST_DEVICE_PLACE", "0")
        monkeypatch.setenv("IMAGECLUST_PREF_NEED_ONLY", "0")
        ref = sh.constrained_ward_bucketed(
            x, min_size=3, max_size=6, bucket_size=16)
        monkeypatch.setenv("IMAGECLUST_SUMMARIZE_FUSED", "1")
        monkeypatch.setenv("IMAGECLUST_DEVICE_PLACE", "1")
        got = sh.constrained_ward_bucketed(
            x, min_size=3, max_size=6, bucket_size=16)
        assert got.cluster_map == ref.cluster_map
        assert got.dropped == ref.dropped
        np.testing.assert_array_equal(got.merges, ref.merges)
