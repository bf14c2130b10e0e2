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

import subprocess  # noqa: E402
import sys  # noqa: E402
from pathlib import Path  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Build the native runtime up front so the native-path tests
# (ic_spill_place, ic_reconstruct_members, fast bucket repair) never
# silently skip: those paths carry the 10M-tier numbers and a quiet skip
# on load-bearing code is a trap. Fails loudly unless a C++ compiler is
# genuinely absent (minimal environments opt out implicitly).
_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"


def _build_native() -> None:
    import shutil

    if shutil.which("make") is None or shutil.which("g++") is None:
        return  # minimal environment: the library tests will skip
    proc = subprocess.run(
        ["make", "-C", str(_NATIVE_DIR)],
        capture_output=True,
        text=True,
    )
    if proc.returncode != 0:
        print(proc.stdout, file=sys.stderr)
        print(proc.stderr, file=sys.stderr)
        raise RuntimeError(
            "conftest: `make -C native` failed — the native runtime is "
            "load-bearing for the loader/sharded tests; fix the build "
            "rather than letting those tests skip."
        )


_build_native()


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
