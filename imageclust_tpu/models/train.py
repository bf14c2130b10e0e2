"""Embedder fine-tuning: a sharded train step (DP batch x TP wide head).

The reference is inference-only (frozen ONNX weights through OpenCV DNN).
A production clustering service needs to adapt its embedder (new domains,
new label vocabularies), so the framework ships a real train step:

* data parallelism over the mesh's ``data`` axis (batch sharded, gradients
  all-reduced by XLA),
* tensor parallelism over ``model`` for the widest layer (the classifier /
  projection head is sharded on its output dimension),
* cross-entropy or cosine-embedding objectives, optax optimizer, BatchNorm
  running-stat updates handled functionally.

Everything is expressed as sharding annotations on one ``jax.jit`` — XLA
inserts the psums/all-gathers (no hand-written collectives).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["TrainState", "make_train_step", "shard_variables", "param_spec"]


class TrainState:
    """Minimal functional train state (params live sharded on the mesh)."""

    def __init__(self, variables: dict, opt_state, tx, step: int = 0):
        self.variables = variables
        self.opt_state = opt_state
        self.tx = tx
        self.step = step


def param_spec(path: tuple, leaf) -> P:
    """Sharding rule: output-shard the wide head over 'model'; everything
    else replicated (convs are small relative to activations here)."""
    names = [getattr(p, "key", str(p)) for p in path]
    joined = "/".join(names)
    if "dense0" in joined or "projection" in joined:
        if names[-1] == "kernel" and leaf.ndim == 2:
            return P(None, "model")
        if names[-1] == "bias" and leaf.ndim == 1:
            return P("model")
    return P()


def shard_variables(variables: dict, mesh: Mesh) -> dict:
    """Place a variables pytree on the mesh per :func:`param_spec`."""
    def place(path, leaf):
        return jax.device_put(leaf, NamedSharding(mesh, param_spec(path, leaf)))

    return jax.tree_util.tree_map_with_path(place, variables)


def variable_shardings(variables: dict, mesh: Mesh):
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_spec(path, leaf)),
        variables,
    )


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh | None = None,
    variables_template: dict | None = None,
) -> Callable:
    """Build the jitted train step.

    Returns ``step(variables, opt_state, images, labels) ->
    (variables, opt_state, loss)`` where ``images`` is an NCHW/NHWC batch and
    ``labels`` integer classes. With ``mesh`` given (requires
    ``variables_template`` for sharding layouts), the batch shards over
    'data' and the head over 'model'.
    """
    has_bn = variables_template is not None and "batch_stats" in variables_template

    def loss_fn(params, batch_stats, images, labels):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
            logits, updates = model.apply(
                variables, images, train=True, mutable=["batch_stats"]
            )
            new_stats = updates["batch_stats"]
        else:
            logits = model.apply(variables, images, train=True)
            new_stats = None
        if isinstance(logits, tuple):
            logits = logits[0]
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), labels
        ).mean()
        return loss, new_stats

    def step(variables, opt_state, images, labels):
        params = variables["params"]
        batch_stats = variables.get("batch_stats")
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, images, labels
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        out = {"params": params}
        if new_stats is not None:
            out["batch_stats"] = new_stats
        return out, opt_state, loss

    if mesh is None:
        return jax.jit(step)

    if variables_template is None:
        raise ValueError("mesh sharding requires variables_template")
    var_sh = variable_shardings(variables_template, mesh)
    # optimizer-state leaves mirror params; derive shardings from a real init
    opt_state0 = tx.init(variables_template["params"])
    opt_sh = _opt_shardings(opt_state0, variables_template["params"], mesh)
    batch_sh = NamedSharding(mesh, P("data"))
    return jax.jit(
        step,
        in_shardings=(var_sh, opt_sh, batch_sh, batch_sh),
        out_shardings=(var_sh, opt_sh, NamedSharding(mesh, P())),
    )


def _opt_shardings(opt_state, params, mesh: Mesh):
    """Optimizer-state leaves that mirror a param pytree get the param's
    sharding; scalar counters replicate."""
    params_flat = {
        tuple(str(getattr(k, "key", k)) for k in path): NamedSharding(
            mesh, param_spec(path, leaf)
        )
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
    }

    def place(path, leaf):
        # match the trailing path components against a param path
        names = tuple(str(getattr(k, "key", k)) for k in path)
        for plen in range(len(names), 0, -1):
            cand = names[-plen:]
            if cand in params_flat and params_flat[cand].spec != P():
                if hasattr(leaf, "ndim") and leaf.ndim > 0:
                    return params_flat[cand]
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(place, opt_state)
