"""Sharded train-step tests (DP x TP over the virtual 8-device mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from imageclust_tpu.models.resnet50 import ResNet50V1
from imageclust_tpu.models.train import (
    make_train_step,
    param_spec,
    shard_variables,
)


@pytest.fixture(scope="module")
def tiny_setup():
    model = ResNet50V1(dtype=jnp.float32, stage_layers=(1, 1, 1, 1),
                       num_classes=16)
    rng = jax.random.PRNGKey(0)
    images = jnp.zeros((4, 3, 32, 32), jnp.float32)
    variables = model.init(rng, images)
    return model, variables


class TestParamSpec:
    def test_head_is_tp_sharded(self, tiny_setup):
        _, variables = tiny_setup
        flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
        specs = {
            "/".join(str(getattr(k, "key", k)) for k in path):
            param_spec(path, leaf)
            for path, leaf in flat
        }
        from jax.sharding import PartitionSpec as P

        assert specs["dense0/kernel"] == P(None, "model")
        assert specs["dense0/bias"] == P("model")
        assert specs["conv0/kernel"] == P()


class TestTrainStep:
    def test_single_device_loss_decreases(self, tiny_setup):
        model, variables = tiny_setup
        tx = optax.sgd(0.05)
        step = make_train_step(model, tx)
        opt_state = tx.init(variables["params"])
        rng = np.random.default_rng(0)
        images = jnp.asarray(rng.normal(size=(8, 3, 32, 32)), jnp.float32)
        labels = jnp.asarray(rng.integers(0, 16, 8), jnp.int32)
        v = variables
        losses = []
        for _ in range(5):
            v, opt_state, loss = step(v, opt_state, images, labels)
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]

    def test_batch_stats_update(self, tiny_setup):
        model, variables = tiny_setup
        tx = optax.sgd(0.01)
        step = make_train_step(model, tx)
        opt_state = tx.init(variables["params"])
        images = jnp.ones((4, 3, 32, 32), jnp.float32) * 3.0
        labels = jnp.zeros((4,), jnp.int32)
        new_vars, _, _ = step(variables, opt_state, images, labels)
        before = variables["batch_stats"]["bn0"]["mean"]
        after = new_vars["batch_stats"]["bn0"]["mean"]
        assert not np.allclose(np.asarray(before), np.asarray(after))

    def test_sharded_step_runs_and_matches_structure(self, tiny_setup, mesh8):
        model, variables = tiny_setup
        tx = optax.adamw(1e-3)
        sharded_vars = shard_variables(variables, mesh8)
        opt_state = tx.init(sharded_vars["params"])
        step = make_train_step(model, tx, mesh=mesh8,
                               variables_template=sharded_vars)
        images = jnp.zeros((8, 3, 32, 32), jnp.float32)
        labels = jnp.zeros((8,), jnp.int32)
        with mesh8:
            new_vars, opt_state, loss = step(sharded_vars, opt_state,
                                             images, labels)
        assert np.isfinite(float(loss))
        # TP sharding survives the update
        k = new_vars["params"]["dense0"]["kernel"]
        assert "model" in str(k.sharding.spec)

    def test_sharded_matches_unsharded_loss(self, tiny_setup, mesh8):
        model, variables = tiny_setup
        tx = optax.sgd(0.1)
        rng = np.random.default_rng(1)
        images = jnp.asarray(rng.normal(size=(8, 3, 32, 32)), jnp.float32)
        labels = jnp.asarray(rng.integers(0, 16, 8), jnp.int32)

        step1 = make_train_step(model, tx)
        _, _, loss1 = step1(variables, tx.init(variables["params"]),
                            images, labels)

        sharded_vars = shard_variables(variables, mesh8)
        stepN = make_train_step(model, tx, mesh=mesh8,
                                variables_template=sharded_vars)
        with mesh8:
            _, _, lossN = stepN(sharded_vars, tx.init(sharded_vars["params"]),
                                images, labels)
        np.testing.assert_allclose(float(loss1), float(lossN), rtol=1e-4)


class TestGraftEntry:
    def test_dryrun_multichip(self):
        import __graft_entry__

        __graft_entry__.dryrun_multichip(8)
