"""Pallas kernel correctness vs the XLA reference formulation.

On CPU the kernels run in interpret mode; on TPU the compiled path is
exercised by bench.py / the cluster engine.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from imageclust_tpu.ops.pallas_kernels import (
    masked_argmin_pair,
    masked_argmin_pair_xla,
    normalize_chw,
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


class TestMaskedArgminPair:
    @pytest.mark.parametrize("n", [128, 256])
    @pytest.mark.parametrize("quantize", [False, True])
    def test_matches_xla(self, rng, n, quantize):
        for trial in range(3):
            D, births, sizes, active = _random_state(rng, n, quantize)
            for max_size in (2, 6, 100):
                want = masked_argmin_pair_xla(D, births, sizes, active,
                                              max_size)
                got = masked_argmin_pair(D, births, sizes, active,
                                         jnp.int32(max_size), interpret=True)
                for w, g in zip(want, got):
                    assert np.asarray(w) == np.asarray(g), (
                        f"n={n} q={quantize} max={max_size} trial={trial}: "
                        f"{[np.asarray(x) for x in want]} != "
                        f"{[np.asarray(x) for x in got]}"
                    )

    def test_all_infeasible(self, rng):
        D, births, sizes, active = _random_state(rng, 128)
        dmin, m1, m2 = masked_argmin_pair(D, births, sizes, active,
                                          jnp.int32(0), interpret=True)
        assert not np.isfinite(np.asarray(dmin))

    def test_respects_active_mask(self, rng):
        D, births, sizes, active = _random_state(rng, 128)
        # plant a zero-distance pair between two INACTIVE slots
        D = D.at[3, 7].set(0.0).at[7, 3].set(0.0)
        active = active.at[3].set(False).at[7].set(False)
        dmin, m1, m2 = masked_argmin_pair(D, births, sizes, active,
                                          jnp.int32(100), interpret=True)
        want = masked_argmin_pair_xla(D, births, sizes, active, 100)
        assert np.asarray(dmin) == np.asarray(want[0]) > 0.0


class TestNormalizeCHW:
    def test_matches_reference(self, rng):
        imgs = rng.integers(0, 256, (2, 16, 128, 3), dtype=np.uint8)
        got = np.asarray(normalize_chw(
            jnp.asarray(imgs), 1 / 255.0, (0.1, 0.2, 0.3), (0.5, 0.6, 0.7),
            bgr_to_rgb=True, interpret=True,
        ))
        x = imgs[..., ::-1].astype(np.float32) / 255.0
        want = ((x - np.array([0.1, 0.2, 0.3])) /
                np.array([0.5, 0.6, 0.7])).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, atol=1e-6)
        assert got.shape == (2, 3, 16, 128)

    def test_no_swap(self, rng):
        imgs = rng.integers(0, 256, (1, 8, 128, 3), dtype=np.uint8)
        got = np.asarray(normalize_chw(
            jnp.asarray(imgs), 1.0, (0, 0, 0), (1, 1, 1),
            bgr_to_rgb=False, interpret=True,
        ))
        np.testing.assert_allclose(
            got, imgs.astype(np.float32).transpose(0, 3, 1, 2)
        )
