"""Subprocess entry point for local multi-process bring-up.

Each worker is a FRESH interpreter (jax.distributed can only initialize
once per process): it forces the CPU platform with its own virtual device
count, joins the coordinator via
:func:`imageclust_tpu.core.mesh.init_distributed` (the exact function a
real multi-host pod calls), then runs the requested module-level target.

The ``verify_*`` bodies below are the executable evidence for the
multi-host leg of SURVEY §5 "distributed communication backend": two OS
processes exchanging real collectives (gloo over localhost here; ICI/DCN
on hardware — the JAX program is identical either way).
"""

from __future__ import annotations

import importlib
import os
import re


def main() -> None:
    dev = int(os.environ.get("IMAGECLUST_MP_DEVICES", "1"))
    # REPLACE any inherited host-device-count flag (the parent test process
    # carries --xla_force_host_platform_device_count=8) rather than append
    flags = re.sub(
        r"--xla_force_host_platform_device_count=\d+",
        "",
        os.environ.get("XLA_FLAGS", ""),
    )
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={dev}"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")

    from imageclust_tpu.core.mesh import init_distributed

    if not init_distributed():
        raise RuntimeError(
            "worker launched without coordinator env "
            "(JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID)"
        )

    target = os.environ["IMAGECLUST_MP_TARGET"]
    mod_name, fn_name = target.rsplit(":", 1)
    fn = getattr(importlib.import_module(mod_name), fn_name)
    fn()
    print("IMAGECLUST_MP_OK", flush=True)


# ---------------------------------------------------------------------------
# Verification bodies (targets for launch_processes). Module-level so any
# process can import them; each asserts on the GLOBAL result, so a green
# run proves the processes actually exchanged data.
# ---------------------------------------------------------------------------


def _global_mesh():
    import jax

    from imageclust_tpu.core.mesh import create_mesh

    n = jax.device_count()
    if n <= jax.local_device_count():
        raise RuntimeError(
            f"expected a multi-process topology, got {n} global / "
            f"{jax.local_device_count()} local devices"
        )
    model = 2 if n % 2 == 0 else 1
    return create_mesh(data=n // model, model=model)


def verify_psum() -> None:
    """A psum across every device of every process."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = _global_mesh()
    n = jax.device_count()
    x = np.arange(n, dtype=np.float32)

    def body(v):
        # the input is invarying over 'model' (replicated there), so the
        # cross-process reduction is over 'data' alone
        return jax.lax.psum(jnp.sum(v), "data")

    f = jax.jit(
        shard_map(
            body,
            mesh=mesh,
            in_specs=P("data"),
            out_specs=P(),
        )
    )
    xg = jax.device_put(x, NamedSharding(mesh, P("data")))
    out = float(f(xg))
    expect = n * (n - 1) / 2
    assert out == expect, f"psum across processes: got {out}, want {expect}"
    print(f"psum ok: {out} over {n} devices", flush=True)


def _global_put(tree, shardings):
    """Host pytree -> global jax.Arrays laid out per ``shardings`` (every
    process holds the same full value; each donates its addressable
    shards — the multi-process form of device_put)."""
    import jax
    import numpy as np

    def put(x, s):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])

    return jax.tree.map(put, tree, shardings)


def verify_train_step() -> None:
    """One DP x TP train step with params/optimizer sharded over the global
    (cross-process) mesh — XLA's gradient all-reduce rides the gloo
    transport here, ICI/DCN on hardware."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from imageclust_tpu.models.resnet50 import ResNet50V1
    from imageclust_tpu.models.train import (
        _opt_shardings,
        make_train_step,
        variable_shardings,
    )

    mesh = _global_mesh()
    n = jax.device_count()
    model = ResNet50V1(dtype=jnp.float32, stage_layers=(1, 1, 1, 1))
    batch = n * 2
    # host leaves -> global arrays matching the step's in_shardings
    # (numpy inputs with non-trivially-sharded layouts are rejected by jit
    # in a multi-process run)
    host_vars = jax.tree.map(
        np.asarray, model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 3, 64, 64), jnp.float32))
    )
    tx = optax.adamw(1e-3)
    variables = _global_put(host_vars, variable_shardings(host_vars, mesh))
    host_opt = jax.tree.map(np.asarray, tx.init(host_vars["params"]))
    opt_state = _global_put(
        host_opt, _opt_shardings(host_opt, host_vars["params"], mesh))
    step = make_train_step(model, tx, mesh=mesh,
                           variables_template=host_vars)
    batch_sh = NamedSharding(mesh, P("data"))
    images = _global_put(
        np.random.default_rng(0).normal(
            size=(batch, 3, 64, 64)).astype(np.float32), batch_sh)
    labels = _global_put(np.zeros((batch,), np.int32), batch_sh)
    with mesh:
        new_vars, opt_state, loss = step(variables, opt_state, images, labels)
        loss.block_until_ready()
    val = float(loss)
    assert np.isfinite(val), f"non-finite loss {val}"
    # params must have moved (the update actually applied)
    w0 = host_vars["params"]["conv0"]["kernel"]
    w1 = np.asarray(
        jax.experimental.multihost_utils.process_allgather(
            new_vars["params"]["conv0"]["kernel"], tiled=True)
    )
    assert not np.allclose(w0, w1), "train step did not update params"
    print(f"train step ok: loss {val:.4f} on {n} devices", flush=True)


def verify_bucketed() -> None:
    """Owner-aligned bucketed clustering over the cross-process mesh must
    equal the single-device engine bit-for-bit (same inputs, same result —
    the all_to_all exchange only moves rows)."""
    import jax
    import numpy as np

    from imageclust_tpu.cluster.sharded import constrained_ward_bucketed

    mesh = _global_mesh()
    x = np.random.default_rng(0).normal(size=(
        jax.device_count() * 24, 16)).astype(np.float32)
    res = constrained_ward_bucketed(
        x, min_size=3, max_size=6, bucket_size=32, mesh=mesh)
    ref = constrained_ward_bucketed(
        x, min_size=3, max_size=6, bucket_size=32, mesh=None)
    assert res.cluster_map == ref.cluster_map, "mesh result diverged"
    assert res.dropped == ref.dropped
    assert len(res.dropped) == 0
    print(f"bucketed ok: {len(res.cluster_map)} clusters on "
          f"{jax.device_count()} devices", flush=True)
    # int8 residency across processes: the owner-aligned all_to_all
    # carries an int8 payload through the gloo backend — mesh result must
    # still equal the single-device int8 engine bit-for-bit
    res8 = constrained_ward_bucketed(
        x, min_size=3, max_size=6, bucket_size=32, mesh=mesh,
        feature_dtype="int8")
    ref8 = constrained_ward_bucketed(
        x, min_size=3, max_size=6, bucket_size=32, mesh=None,
        feature_dtype="int8")
    assert res8.cluster_map == ref8.cluster_map, "int8 mesh result diverged"
    print("bucketed int8 ok", flush=True)


def verify_pipeline() -> None:
    """`Pipeline.run_paths` end to end across the cross-process mesh —
    streamed ingest -> DP-sharded embed (global batch arrays built via
    make_array_from_callback) -> fuse -> owner-aligned bucketed clustering
    -> naming -> report, with every process executing the same SPMD
    program. The partition must equal the single-process pipeline's run in
    the same interpreter (multi-host counterpart of the reference's
    single-process orchestration, workflow.go:66-108).

    Expects IMAGECLUST_MP_IMAGES (a directory of images every process can
    read — identical host bytes are what make the global batch arrays
    consistent) and IMAGECLUST_MP_WORK (scratch root; each process writes
    its own job dirs under it).
    """
    import glob

    import jax
    import jax.numpy as jnp

    from imageclust_tpu.config import (
        AppConfig,
        ClusterConfig,
        LabelConfig,
        NamingConfig,
    )
    from imageclust_tpu.models.registry import Embedder, EmbedderSpec
    from imageclust_tpu.pipeline import Pipeline

    mesh = _global_mesh()
    paths = sorted(
        glob.glob(os.path.join(os.environ["IMAGECLUST_MP_IMAGES"], "*")))
    assert paths, "no images shared with the workers"
    work = os.environ["IMAGECLUST_MP_WORK"]

    def toy_embedder(m):
        # the production Embedder class (its mesh machinery is the thing
        # under test) around a tiny deterministic apply_fn
        spec = EmbedderSpec(
            name="toy", input_size=16, dim=3, scale=1 / 255.0,
            mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0), bgr_input=True,
        )

        def apply_fn(variables, x):
            return jnp.mean(x, axis=(1, 2)) * 10.0 + variables["b"]

        return Embedder(spec, apply_fn, {"b": jnp.zeros((3,))},
                        batch_size=8, mesh=m, tag="toy:mp-pipeline")

    def cfg():
        return AppConfig(
            labels=LabelConfig(backend="fake"),
            naming=NamingConfig(services=("fake",), retries=1),
            # len(paths) >> exact_limit: forces the streamed big-job path
            cluster=ClusterConfig(exact_limit=4, bucket_size=16),
        )

    pid = jax.process_index()
    res = Pipeline(cfg(), mesh=mesh, embedder=toy_embedder(mesh)).run_paths(
        paths, os.path.join(work, f"mesh_p{pid}"), min_size=3, max_size=8)
    ref = Pipeline(cfg(), embedder=toy_embedder(None)).run_paths(
        paths, os.path.join(work, f"one_p{pid}"), min_size=3, max_size=8)

    part = {frozenset(d.images) for d in res.clusters.values()}
    ref_part = {frozenset(d.images) for d in ref.clusters.values()}
    assert part == ref_part, "multi-process pipeline partition diverged"
    assert res.dropped == ref.dropped == []
    assert os.path.exists(res.html_path), "mesh job wrote no report"
    for d in res.clusters.values():
        assert d.labels and d.title  # labels + naming flowed through
    print(
        f"pipeline ok: {len(res.clusters)} clusters on "
        f"{jax.device_count()} devices / {jax.process_count()} processes",
        flush=True,
    )


def verify_all() -> None:
    """psum + train step + owner-aligned clustering in one bring-up."""
    verify_psum()
    verify_train_step()
    verify_bucketed()


def _fail() -> None:  # test target for the launcher's failure reporting
    raise RuntimeError("intentional worker failure")


if __name__ == "__main__":
    main()
