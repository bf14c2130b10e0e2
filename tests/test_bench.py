"""Unit coverage for bench.py helpers the driver's headline run depends on.

bench.py itself runs on the real chip; these tests pin the pure-logic pieces
so a refactor can't silently break the round-end benchmark. The blockwise
feature synthesis exists because a one-shot ``jax.random.normal`` at
10M x 512 materializes ~2x the feature bytes in raw random bits and OOMs the
chip (see bench._synth_features)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def test_synth_features_one_shot_path():
    import jax.numpy as jnp

    x = bench._synth_features(512, 16, jnp.float32)
    a = np.asarray(x)
    assert a.shape == (512, 16) and a.dtype == np.float32
    assert abs(a.mean()) < 0.1 and abs(a.std() - 1.0) < 0.1


def test_synth_features_block_path_fills_every_row():
    """Drive the donated-buffer block path (threshold forced to 0) on shapes
    with and without a clamped tail block: no row may stay at its zero
    initialization, statistics must stay unit-gaussian, and dtype must hold."""
    import jax.numpy as jnp

    for n in (96, 100):  # 96 = exact multiple of the 32-row block, 100 = clamped tail
        x = bench._synth_features(
            n, 30, jnp.float32, one_shot_elems=0, block_elems=32 * 30
        )
        a = np.asarray(x)
        assert a.shape == (n, 30)
        assert not np.any(np.all(a == 0.0, axis=1)), "unfilled row"
        assert abs(a.mean()) < 0.1 and abs(a.std() - 1.0) < 0.15


def test_synth_features_block_path_bf16():
    import jax.numpy as jnp

    x = bench._synth_features(
        64, 8, jnp.bfloat16, one_shot_elems=0, block_elems=16 * 8
    )
    assert x.dtype == jnp.bfloat16 and x.shape == (64, 8)
    a = np.asarray(x, dtype=np.float32)
    assert not np.any(np.all(a == 0.0, axis=1))


def test_embed_only_mode():
    """bench --embed-only: one-command per-tower throughput (any registry
    model + quantize), JSON contract preserved."""
    result = bench.bench_embed_only("resnet50", batch_size=8, n_images=16)
    assert result["unit"] == "img/s/chip"
    assert result["value"] > 0
    assert result["detail"]["model"] == "resnet50"
    assert "embed_img_per_s[resnet50 b8]" == result["metric"]
