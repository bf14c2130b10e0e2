"""Pallas kernel correctness vs the XLA reference formulation.

On CPU the kernel runs in interpret mode; on TPU the compiled path is the
DEFAULT single-device exact merge loop (cluster/ward.py), where it measured
3.0x over the unfused body at n=4096 with bit-identical merge logs
(BASELINE.md round-2 notes).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from imageclust_tpu.ops.pallas_kernels import (
    masked_argmin_pair_xla,
    merge_update_argmin,
)


def _random_state(rng, n, quantize=False):
    d = rng.random((n, n)).astype(np.float32)
    if quantize:
        d = np.round(d * 4) / 4  # force exact ties
    d = (d + d.T) / 2
    np.fill_diagonal(d, 0.0)
    births = rng.permutation(2 * n)[:n].astype(np.int32)
    sizes = rng.integers(1, 4, n).astype(np.int32)
    active = rng.random(n) > 0.2
    if active.sum() < 2:
        active[:2] = True
    return (jnp.asarray(d), jnp.asarray(births), jnp.asarray(sizes),
            jnp.asarray(active))


class TestMergeUpdateArgmin:
    @pytest.mark.parametrize("n", [128, 256])
    @pytest.mark.parametrize("quantize", [False, True])
    def test_no_update_matches_xla_argmin(self, rng, n, quantize):
        for trial in range(3):
            D, births, sizes, active = _random_state(rng, n, quantize)
            for max_size in (2, 6, 100):
                want = masked_argmin_pair_xla(D, births, sizes, active,
                                              max_size)
                D2, *got = merge_update_argmin(
                    D, jnp.zeros(n), 0, 0, births, sizes, active,
                    jnp.int32(max_size), interpret=True)
                np.testing.assert_array_equal(np.asarray(D2), np.asarray(D))
                for w, g in zip(want, got):
                    assert np.asarray(w) == np.asarray(g), (
                        f"n={n} q={quantize} max={max_size} trial={trial}")

    def test_update_applied_then_argmin(self, rng):
        n = 256
        D, births, sizes, active = _random_state(rng, n)
        sa = 7
        dvec = jnp.asarray(rng.random(n).astype(np.float32)).at[sa].set(0.0)
        D2, dmin, m1, m2 = merge_update_argmin(
            D, dvec, sa, 1, births, sizes, active, jnp.int32(6),
            interpret=True)
        Dm = np.asarray(D).copy()
        Dm[sa, :] = np.asarray(dvec)
        Dm[:, sa] = np.asarray(dvec)
        np.testing.assert_array_equal(np.asarray(D2), Dm)
        want = masked_argmin_pair_xla(jnp.asarray(Dm), births, sizes, active,
                                      jnp.int32(6))
        assert (float(dmin), int(m1), int(m2)) == (
            float(want[0]), int(want[1]), int(want[2]))

    def test_all_infeasible(self, rng):
        D, births, sizes, active = _random_state(rng, 128)
        _, dmin, m1, m2 = merge_update_argmin(
            D, jnp.zeros(128), 0, 0, births, sizes, active, jnp.int32(0),
            interpret=True)
        assert not np.isfinite(np.asarray(dmin))

    def test_respects_active_mask(self, rng):
        D, births, sizes, active = _random_state(rng, 128)
        D = D.at[3, 7].set(0.0).at[7, 3].set(0.0)
        active = active.at[3].set(False).at[7].set(False)
        _, dmin, m1, m2 = merge_update_argmin(
            D, jnp.zeros(128), 0, 0, births, sizes, active, jnp.int32(100),
            interpret=True)
        want = masked_argmin_pair_xla(D, births, sizes, active, 100)
        assert np.asarray(dmin) == np.asarray(want[0]) > 0.0


class TestFusedMergeLoop:
    """The fused Pallas exact loop must produce the EXACT same merge log /
    clusters as the unfused body — it is the default on TPU."""

    @pytest.mark.parametrize("rule", ["lance_williams", "centroid"])
    def test_fused_equals_unfused(self, rng, monkeypatch, rule):
        import importlib

        import imageclust_tpu.cluster.ward as ward

        x = rng.normal(size=(300, 16)).astype(np.float32)
        ids = [f"i{k}" for k in range(len(x))]
        monkeypatch.setenv("IMAGECLUST_FUSED_MERGE", "0")
        a = ward.constrained_ward(x, ids, min_size=3, max_size=6,
                                  update_rule=rule)
        monkeypatch.setenv("IMAGECLUST_FUSED_MERGE", "1")
        b = ward.constrained_ward(x, ids, min_size=3, max_size=6,
                                  update_rule=rule)
        assert a.cluster_map == b.cluster_map
        assert a.dropped == b.dropped
        np.testing.assert_array_equal(a.merges, b.merges)


class TestMergeUpdateArgminBatched:
    """The batched (per-bucket) fused step must agree with the XLA
    reference per bucket, including the absorb-phase feasibility."""

    def test_matches_xla_per_bucket(self, rng):
        from imageclust_tpu.ops.pallas_kernels import (
            merge_update_argmin_batched,
        )

        C, B = 3, 128
        Ds, bs, ss, acts = [], [], [], []
        for _ in range(C):
            d, b, s, a = _random_state(rng, B)
            Ds.append(d); bs.append(b); ss.append(s); acts.append(a)
        D = jnp.stack(Ds); births = jnp.stack(bs)
        sizes = jnp.stack(ss); active = jnp.stack(acts)
        for amin in (-1, 2):
            D_out, dmin, m1, m2 = merge_update_argmin_batched(
                D, jnp.zeros((C, B), jnp.float32), jnp.zeros(C, jnp.int32),
                jnp.zeros(C, jnp.int32), births, sizes, active,
                jnp.int32(6), jnp.int32(amin), interpret=True)
            np.testing.assert_array_equal(np.asarray(D_out), np.asarray(D))
            for c in range(C):
                want = masked_argmin_pair_xla(
                    D[c], births[c], sizes[c], active[c], jnp.int32(6),
                    require_under=None if amin <= 0 else jnp.int32(amin))
                assert float(dmin[c]) == float(want[0]) or (
                    np.isinf(float(dmin[c])) and np.isinf(float(want[0])))
                if np.isfinite(float(want[0])):
                    assert int(m1[c]) == int(want[1])
                    assert int(m2[c]) == int(want[2])

    def test_update_applied_per_bucket(self, rng):
        from imageclust_tpu.ops.pallas_kernels import (
            merge_update_argmin_batched,
        )

        C, B = 2, 128
        d0, b0, s0, a0 = _random_state(rng, B)
        d1, b1, s1, a1 = _random_state(rng, B)
        D = jnp.stack([d0, d1])
        dvec = jnp.asarray(rng.random((C, B)).astype(np.float32))
        sa = jnp.asarray([3, 7], jnp.int32)
        do = jnp.asarray([1, 0], jnp.int32)  # bucket 1: no pending update
        D_out, *_ = merge_update_argmin_batched(
            D, dvec, sa, do, jnp.stack([b0, b1]), jnp.stack([s0, s1]),
            jnp.stack([a0, a1]), jnp.int32(6), jnp.int32(-1),
            interpret=True)
        out = np.asarray(D_out)
        np.testing.assert_array_equal(out[0][3, :], np.asarray(dvec)[0])
        np.testing.assert_array_equal(out[0][:, 3], np.asarray(dvec)[0])
        np.testing.assert_array_equal(out[1], np.asarray(d1))  # untouched


class TestFusedBucketLoop:
    """The fused lockstep bucket loop must be result-identical to the
    vmapped unfused loop — cluster ids, member order, merge logs, drops."""

    @pytest.mark.parametrize("rule", ["lance_williams", "centroid"])
    def test_fused_equals_unfused(self, rng, monkeypatch, rule):
        import imageclust_tpu.cluster.sharded as sh

        x = rng.normal(size=(300, 8)).astype(np.float32)
        monkeypatch.setenv("IMAGECLUST_FUSED_MERGE", "0")
        ref = sh.constrained_ward_bucketed(
            x, min_size=3, max_size=6, bucket_size=128, update_rule=rule)
        monkeypatch.setenv("IMAGECLUST_FUSED_MERGE", "1")
        got = sh.constrained_ward_bucketed(
            x, min_size=3, max_size=6, bucket_size=128, update_rule=rule)
        assert got.cluster_map == ref.cluster_map
        assert got.dropped == ref.dropped
        np.testing.assert_array_equal(got.merges, ref.merges)

    def test_fused_absorb_no_loss(self, rng, monkeypatch):
        import imageclust_tpu.cluster.sharded as sh

        monkeypatch.setenv("IMAGECLUST_FUSED_MERGE", "1")
        x = rng.normal(size=(400, 8)).astype(np.float32)
        res = sh.constrained_ward_bucketed(
            x, min_size=3, max_size=6, bucket_size=128)
        placed = sum(len(m) for m in res.cluster_map.values())
        assert placed + len(res.dropped) == 400
        assert len(res.dropped) == 0
        for members in res.cluster_map.values():
            assert 3 <= len(members) <= 6

    def test_unaligned_bucket_width_uses_vmapped(self, rng, monkeypatch):
        # B=64 is not stripe-aligned: the dispatcher must fall back
        import imageclust_tpu.cluster.sharded as sh

        monkeypatch.setenv("IMAGECLUST_FUSED_MERGE", "1")
        x = rng.normal(size=(300, 8)).astype(np.float32)
        res = sh.constrained_ward_bucketed(
            x, min_size=3, max_size=6, bucket_size=64)
        monkeypatch.setenv("IMAGECLUST_FUSED_MERGE", "0")
        ref = sh.constrained_ward_bucketed(
            x, min_size=3, max_size=6, bucket_size=64)
        assert res.cluster_map == ref.cluster_map


class TestWholeBucketLoop:
    """The whole-loop-in-VMEM kernel (merge_loop_whole) must be
    result-identical to both the vmapped unfused loop and the lockstep
    fused-step loop — cluster ids, member order, merge logs, drops."""

    def test_whole_equals_unfused_and_fused_step(self, rng, monkeypatch):
        import jax.numpy as jnp

        import imageclust_tpu.cluster.sharded as sh

        feats = jnp.asarray(rng.normal(size=(3 * 128, 16))
                            .astype(np.float32))
        bucket_idx = jnp.arange(3 * 128, dtype=jnp.int32).reshape(3, 128)
        counts = jnp.asarray([128, 37, 5], jnp.int32)
        targets = jnp.asarray([25, 9, 1], jnp.int32)
        args = (feats, bucket_idx, counts, targets,
                jnp.int32(6), jnp.int32(3))
        for absorb in (True, False):
            ref = sh._bucket_chunk(*args, update_rule="lance_williams",
                                   absorb=absorb)
            stepped = sh._bucket_chunk_fused(
                *args, update_rule="lance_williams", absorb=absorb,
                interpret=True)
            whole = sh._bucket_chunk_whole(*args, absorb=absorb,
                                           interpret=True)
            for a, b, c in zip(ref, stepped, whole):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
                np.testing.assert_array_equal(np.asarray(a), np.asarray(c))

    def test_whole_merge_env_opt_out(self, rng, monkeypatch):
        # IMAGECLUST_WHOLE_MERGE=0 falls back to the lockstep fused-step
        # loop; results must not change either way.
        import imageclust_tpu.cluster.sharded as sh

        x = rng.normal(size=(300, 8)).astype(np.float32)
        monkeypatch.setenv("IMAGECLUST_FUSED_MERGE", "1")
        monkeypatch.setenv("IMAGECLUST_WHOLE_MERGE", "0")
        ref = sh.constrained_ward_bucketed(
            x, min_size=3, max_size=6, bucket_size=128)
        monkeypatch.setenv("IMAGECLUST_WHOLE_MERGE", "1")
        got = sh.constrained_ward_bucketed(
            x, min_size=3, max_size=6, bucket_size=128)
        assert got.cluster_map == ref.cluster_map
        assert got.dropped == ref.dropped
        np.testing.assert_array_equal(got.merges, ref.merges)


class TestPrefTopkFused:
    """The fused nearest-bucket top-k scan (pref_topk_block /
    _pref_need_rows_fused). Test data is INTEGER-VALUED so every f32
    intermediate on every path is exact — ordering and index tie-breaks
    are then fully pinned (ascending distance, ties by ascending centroid
    index), with no near-tie rounding escape hatch needed."""

    @staticmethod
    def _oracle(x, c, kk):
        # exact integer arithmetic in float64; ties -> ascending index
        scores = (c.astype(np.float64) ** 2).sum(1)[None, :] \
            - 2.0 * x.astype(np.float64) @ c.astype(np.float64).T
        out = np.empty((x.shape[0], kk), np.int32)
        for r in range(x.shape[0]):
            out[r] = np.lexsort((np.arange(c.shape[0]), scores[r]))[:kk]
        return out

    def test_kernel_matches_oracle_multichunk(self, rng):
        from imageclust_tpu.ops.pallas_kernels import pref_topk_block

        R, d, k, kk, blk = 16, 128, 384, 8, 128  # 3 centroid chunks
        x = rng.integers(-20, 20, (R, d)).astype(np.float32)
        c = rng.integers(-20, 20, (k, d)).astype(np.float32)
        cn = (c.astype(np.float64) ** 2).sum(1).astype(np.float32)
        got = pref_topk_block(jnp.asarray(x), jnp.asarray(c),
                              jnp.asarray(cn), kk=kk, block_c=blk,
                              interpret=True)
        np.testing.assert_array_equal(np.asarray(got),
                                      self._oracle(x, c, kk))

    def test_kernel_exact_ties_break_by_index(self, rng):
        from imageclust_tpu.ops.pallas_kernels import pref_topk_block

        # duplicate centroids across DIFFERENT chunks: equal distances
        # must order by ascending global centroid index
        R, d, kk, blk = 8, 128, 4, 128
        base = rng.integers(-5, 5, (blk, d)).astype(np.float32)
        c = np.concatenate([base, base])  # chunk 2 duplicates chunk 1
        x = rng.integers(-5, 5, (R, d)).astype(np.float32)
        cn = (c ** 2).sum(1).astype(np.float32)
        got = np.asarray(pref_topk_block(
            jnp.asarray(x), jnp.asarray(c), jnp.asarray(cn), kk=kk,
            block_c=blk, interpret=True))
        np.testing.assert_array_equal(got, self._oracle(x, c, kk))
        # each tied twin-pair appears lower-index first, adjacent
        np.testing.assert_array_equal(got[:, 1], got[:, 0] + blk)
        np.testing.assert_array_equal(got[:, 3], got[:, 2] + blk)
        assert got[:, 0].max() < blk and got[:, 2].max() < blk

    def test_need_rows_fused_matches_tile_path(self, rng):
        """_pref_need_rows_fused == _pref_need_rows on integer-valued data
        for every residency dtype (f32 / bf16 / int8), including k and d
        padding (k not a chunk multiple, d not a lane multiple)."""
        import imageclust_tpu.cluster.sharded as sh

        n, d, k, kk = 600, 48, 19, 8
        base = rng.integers(-30, 30, (n, d)).astype(np.float32)
        for dt in (jnp.float32, jnp.bfloat16, jnp.int8):
            x = jnp.asarray(base.astype(np.int8) if dt == jnp.int8
                            else base).astype(dt)
            cents, _, _, _ = sh.kmeans(x, k, iters=2, top_k=0)
            # integer-grid centroids so both paths' arithmetic is exact
            cents = jnp.round(cents)
            idx = rng.choice(n, size=300, replace=False).astype(np.int32)
            idx_pad = np.zeros(512, np.int32)
            idx_pad[:len(idx)] = idx
            blk = sh._kmeans_block(n, k, sh._KMEANS_BLOCK)
            m_tile = -(-512 // blk) * blk
            idx_tile = np.zeros(m_tile, np.int32)
            idx_tile[:len(idx)] = idx
            want = np.asarray(sh._pref_need_rows(
                x, cents, jnp.asarray(idx_tile), kk=kk, block=blk,
                as_u16=True))[:len(idx)]
            got = np.asarray(sh._pref_need_rows_fused(
                x, cents, jnp.asarray(idx_pad), kk=kk, block_c=512,
                as_u16=True, interpret=True))[:len(idx)]
            np.testing.assert_array_equal(got, want, err_msg=str(dt))

    def test_engine_identical_with_fused_prefs(self, rng, monkeypatch):
        """Full bucketed run: fused pref scan vs tile pref scan must give
        identical partitions (need-only mode forced so the pref path is
        actually exercised; skewed blobs force spills + dissolves).

        Integer-grid data (like the sibling tests and the fuzzer-proven
        tie-free domain): the two paths match only up to MXU/reduction-
        order rounding, so continuous floats could flip a near-tie under
        a toolchain bump even inside the documented envelope; on the
        integer grid every intermediate is exactly representable."""
        import imageclust_tpu.cluster.sharded as sh

        centers = (rng.integers(-5, 6, (6, 12)) * 8).astype(np.float32)
        sizes = [160, 90, 40, 20, 6, 2]
        x = np.concatenate([
            c + rng.integers(-2, 3, (s, 12)).astype(np.float32)
            for c, s in zip(centers, sizes)])
        x = x[rng.permutation(len(x))]
        monkeypatch.setenv("IMAGECLUST_PREF_NEED_ONLY", "1")
        monkeypatch.setenv("IMAGECLUST_PREF_FUSED", "0")
        ref = sh.constrained_ward_bucketed(
            x, min_size=3, max_size=6, bucket_size=16)
        monkeypatch.setenv("IMAGECLUST_PREF_FUSED", "1")
        got = sh.constrained_ward_bucketed(
            x, min_size=3, max_size=6, bucket_size=16)
        assert got.cluster_map == ref.cluster_map
        assert got.dropped == ref.dropped


class TestSummarizeFused:
    """Summarize-fused preferences (_kmeans_summarize_fused /
    pref_topk_block with_dists): one gram pass yields assignment + own
    distance + the preference matrix. Integer-valued test data, like
    TestPrefTopkFused — every f32 intermediate on every path is exact, so
    equality is pinned with no near-tie rounding escape hatch."""

    def test_with_dists_values_exact(self, rng):
        from imageclust_tpu.ops.pallas_kernels import pref_topk_block

        R, d, k, kk, blk = 16, 128, 384, 8, 128  # 3 centroid chunks
        x = rng.integers(-20, 20, (R, d)).astype(np.float32)
        c = rng.integers(-20, 20, (k, d)).astype(np.float32)
        cn = (c.astype(np.float64) ** 2).sum(1).astype(np.float32)
        got_i, got_v = pref_topk_block(
            jnp.asarray(x), jnp.asarray(c), jnp.asarray(cn), kk=kk,
            block_c=blk, interpret=True, with_dists=True)
        got_i, got_v = np.asarray(got_i), np.asarray(got_v)
        d2 = ((x[:, None, :].astype(np.float64)
               - c[None, :, :].astype(np.float64)) ** 2).sum(-1)
        want_v = np.take_along_axis(d2, got_i, axis=1)
        np.testing.assert_array_equal(got_v, want_v.astype(np.float32))
        # ascending per row; lane 0 is the own (nearest) distance
        assert (np.diff(got_v, axis=1) >= 0).all()
        np.testing.assert_array_equal(got_v[:, 0], d2.min(1))

    def test_summarize_fused_matches_tile_path(self, rng):
        """assign / own_d / prefs identical to _kmeans_summarize on
        integer-valued data for every residency dtype, including d and k
        padding and the < rows_blk tail."""
        import imageclust_tpu.cluster.sharded as sh

        n, d, k, kk = 600, 48, 19, 8
        base = rng.integers(-30, 30, (n, d)).astype(np.float32)
        for dt in (jnp.float32, jnp.bfloat16, jnp.int8):
            x = jnp.asarray(base.astype(np.int8) if dt == jnp.int8
                            else base).astype(dt)
            cents, _, _, _ = sh.kmeans(x, k, iters=2, top_k=0)
            cents = jnp.round(cents)  # integer grid: exact on both paths
            blk = sh._kmeans_block(n, k, sh._KMEANS_BLOCK)
            a1, o1, p1 = sh._kmeans_summarize(x, cents, kk=kk, block=blk)
            a2, o2, p2 = sh._kmeans_summarize_fused(
                x, cents, kk=kk, block_c=512, as_u16=True, interpret=True)
            np.testing.assert_array_equal(np.asarray(a2), np.asarray(a1),
                                          err_msg=str(dt))
            np.testing.assert_array_equal(np.asarray(o2), np.asarray(o1),
                                          err_msg=str(dt))
            np.testing.assert_array_equal(
                np.asarray(p2).astype(np.int32), np.asarray(p1),
                err_msg=str(dt))

    def test_engine_identical_with_summarize_fused(self, rng, monkeypatch):
        """Full bucketed run: summarize-fused prefs vs the tile full-pref
        path give identical partitions on integer-grid blobs (skewed sizes
        force spills + dissolves, so repair actually consumes the prefs)."""
        import imageclust_tpu.cluster.sharded as sh

        centers = (rng.integers(-5, 6, (6, 12)) * 8).astype(np.float32)
        sizes = [160, 90, 40, 20, 6, 2]
        x = np.concatenate([
            c + rng.integers(-2, 3, (s, 12)).astype(np.float32)
            for c, s in zip(centers, sizes)])
        x = x[rng.permutation(len(x))]
        monkeypatch.setenv("IMAGECLUST_SUMMARIZE_FUSED", "0")
        monkeypatch.setenv("IMAGECLUST_PREF_NEED_ONLY", "0")
        ref = sh.constrained_ward_bucketed(
            x, min_size=3, max_size=6, bucket_size=16)
        monkeypatch.setenv("IMAGECLUST_SUMMARIZE_FUSED", "1")
        got = sh.constrained_ward_bucketed(
            x, min_size=3, max_size=6, bucket_size=16)
        assert got.cluster_map == ref.cluster_map
        assert got.dropped == ref.dropped
