"""Embedder fine-tuning driver: labeled image folders -> adapted tower.

Builds on :mod:`imageclust_tpu.models.train` (the sharded step). Data comes
from a directory of ``<label>/`` subfolders; the classifier head is resized
to the label count; the tuned variables save as an Orbax checkpoint
(reloadable via ``EmbedConfig.checkpoint_path``) and optionally export back
to ONNX (models/onnx_export.py).
"""

from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from imageclust_tpu.config import EmbedConfig
from imageclust_tpu.data.loader import load_image_dir
from imageclust_tpu.ops.preprocess import preprocess_batch

log = logging.getLogger(__name__)

__all__ = ["load_labeled_dir", "finetune_resnet50"]


def load_labeled_dir(root: str, size: int = 224):
    """(images u8 BGR (N,size,size,3), labels (N,), class_names)."""
    classes = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )
    if not classes:
        raise ValueError(f"no class subdirectories under {root}")
    images, labels = [], []
    for ci, cname in enumerate(classes):
        _, batch = load_image_dir(os.path.join(root, cname), size=size)
        images.append(batch)
        labels.extend([ci] * len(batch))
    return np.concatenate(images), np.asarray(labels, np.int32), classes


def finetune_resnet50(
    data_dir: str,
    out_path: str,
    epochs: int = 3,
    batch_size: int = 64,
    learning_rate: float = 1e-3,
    mesh=None,
    seed: int = 0,
    onnx_out: str = "",
    init_onnx: str = "",
    stage_layers=None,
    input_size: int = 224,
    resume: bool = True,
):
    """Fine-tune ResNet50 on labeled folders; returns (variables, classes,
    final loss). Saves an Orbax checkpoint at ``out_path``; the full train
    state (params + optimizer + epoch) checkpoints per epoch at
    ``<out_path>_state`` so an interrupted run resumes where it stopped
    (SURVEY.md §5 checkpoint/resume — the reference has none)."""
    from imageclust_tpu.models.resnet50 import ResNet50V1, load_onnx_params
    from imageclust_tpu.models.train import make_train_step, shard_variables
    from imageclust_tpu.utils.checkpoint import restore_variables, save_variables

    from imageclust_tpu.models.resnet50 import GLUON_STAGE_LAYERS

    stage_layers = tuple(stage_layers or GLUON_STAGE_LAYERS)
    images, labels, classes = load_labeled_dir(data_dir, size=input_size)
    n = len(images)
    if n < batch_size:
        batch_size = max(1, n)
    log.info("fine-tuning on %d images, %d classes", n, len(classes))

    model = ResNet50V1(dtype=jnp.bfloat16, num_classes=len(classes),
                       stage_layers=stage_layers)
    rng = jax.random.PRNGKey(seed)
    dummy = jnp.zeros((1, 3, input_size, input_size), jnp.float32)
    variables = model.init(rng, dummy)
    if init_onnx and os.path.exists(init_onnx):
        # warm-start the backbone from the reference checkpoint; the head is
        # re-initialized at the new class count
        full = ResNet50V1(dtype=jnp.bfloat16, stage_layers=stage_layers)
        full_vars = full.init(rng, dummy)
        loaded = load_onnx_params(init_onnx, dict(full_vars),
                                  stage_layers=stage_layers)
        params = dict(loaded["params"])
        params["dense0"] = variables["params"]["dense0"]
        variables = {"params": params, "batch_stats": loaded["batch_stats"]}

    if mesh is not None:
        variables = shard_variables(variables, mesh)
    tx = optax.adamw(learning_rate)
    opt_state = tx.init(variables["params"])
    step = make_train_step(model, tx, mesh=mesh,
                           variables_template=variables if mesh else None)

    pre = jax.jit(lambda u8: preprocess_batch(u8, size=input_size))
    rng_np = np.random.default_rng(seed)
    loss = float("nan")

    state_path = os.path.abspath(out_path) + "_state"
    start_epoch = 0
    if resume and os.path.isdir(state_path):
        template = {
            "variables": jax.device_get(variables),
            "opt_state": jax.device_get(opt_state),
            "epoch": np.zeros((), np.int64),
        }
        restored = restore_variables(state_path, template)
        variables = restored["variables"]
        opt_state = restored["opt_state"]
        start_epoch = int(restored["epoch"])
        log.info("resuming fine-tune from epoch %d", start_epoch)

    for epoch in range(start_epoch, epochs):
        order = rng_np.permutation(n)
        losses = []
        for start in range(0, n - batch_size + 1, batch_size):
            idx = order[start:start + batch_size]
            blob = pre(jnp.asarray(images[idx]))
            variables, opt_state, loss = step(
                variables, opt_state, blob, jnp.asarray(labels[idx])
            )
            losses.append(float(loss))
        log.info("epoch %d: mean loss %.4f", epoch, np.mean(losses))
        loss = float(np.mean(losses))
        save_variables(state_path, {
            "variables": jax.device_get(variables),
            "opt_state": jax.device_get(opt_state),
            "epoch": np.asarray(epoch + 1, np.int64),
        })

    save_variables(out_path, jax.device_get(variables))
    if onnx_out:
        from imageclust_tpu.models.onnx_export import export_resnet50_onnx

        export_resnet50_onnx(
            jax.device_get(variables), onnx_out, num_classes=len(classes),
            stage_layers=stage_layers, input_size=input_size,
        )
    with open(os.path.join(os.path.dirname(os.path.abspath(out_path)) or ".",
                           "classes.txt"), "w") as fh:
        fh.write("\n".join(classes))
    return variables, classes, loss
