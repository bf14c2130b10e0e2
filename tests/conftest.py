"""Test harness: force a CPU backend with 8 virtual devices.

This must run before anything imports jax, mirroring the standard JAX
practice for testing multi-device sharding without hardware
(``--xla_force_host_platform_device_count``). SURVEY.md §4 item 8.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Some environments preimport jax at interpreter start (a sitecustomize TPU
# plugin hook), making the env vars above too late — the config update wins
# as long as no backend has initialized yet.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from imageclust_tpu.core.mesh import create_mesh

    return create_mesh(data=4, model=2)


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)


def make_blobs(rng, n_blobs=5, per_blob=10, d=8, spread=0.05, sep=10.0):
    """Well-separated Gaussian blobs: cluster structure robust to f32
    reduction-order differences between the Go-faithful oracle and the
    vectorized engine."""
    centers = rng.normal(size=(n_blobs, d)).astype(np.float32) * sep
    pts = []
    for c in centers:
        pts.append(c + rng.normal(size=(per_blob, d)).astype(np.float32) * spread)
    x = np.concatenate(pts).astype(np.float32)
    perm = rng.permutation(len(x))
    return x[perm]


@pytest.fixture()
def blobs():
    return make_blobs
