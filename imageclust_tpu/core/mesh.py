"""Device-mesh construction and sharding helpers.

The reference has no distributed story at all — its only concurrency is Go
goroutines in one process (internal/workflow/workflow.go:149-185) and its
inference is serialized behind a mutex (internal/embeddings/embeddings.go:133).
Here parallelism is expressed the TPU way: a ``jax.sharding.Mesh`` over the
chips of a slice, with ``NamedSharding`` annotations and XLA-inserted
collectives. The two axes are:

* ``data``  — batch / image-shard axis (data-parallel embedding, row shards of
  the distance matrix, bucket shards of the scalable clusterer),
* ``model`` — tensor-parallel axis for wide layers (e.g. the 1000-way dense
  head, ViT MLPs).

Tests and the multi-chip dry run use CPU virtual devices via
``--xla_force_host_platform_device_count``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "create_mesh",
    "data_sharding",
    "replicated",
    "axis_size",
    "init_distributed",
]


def init_distributed() -> bool:
    """Initialize multi-host JAX over DCN when launched under a multi-host
    coordinator (JAX_COORDINATOR_ADDRESS / standard TPU pod metadata).

    Single-host runs are a no-op. After this, ``jax.devices()`` spans every
    host's chips and :func:`create_mesh` lays the global mesh; XLA routes
    intra-slice collectives over ICI and cross-slice over DCN.

    When JAX_NUM_PROCESSES / JAX_PROCESS_ID are also set (the explicit
    local bring-up used by :func:`imageclust_tpu.parallel.launch_processes`
    and its 2-process CPU tests), the coordinator parameters are passed
    explicitly and the CPU backend gets gloo cross-process collectives —
    the same code path a real multi-host pod takes, executable on one box.
    """
    import os

    coord = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if not coord:
        return False
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if nproc is not None and pid is not None:
        # CPU cross-process collectives need an explicit implementation
        # (must be set before the backend initializes; no-op for TPU pods)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(pid),
        )
    else:
        jax.distributed.initialize()  # pod metadata auto-detection
    return True


def create_mesh(
    data: int = -1,
    model: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Create a 2-axis ('data', 'model') mesh over the available devices.

    ``data=-1`` consumes all devices not claimed by ``model``.
    """
    devs = np.array(devices if devices is not None else jax.devices())
    n = devs.size
    if model <= 0:
        model = 1
    if data > 0 and data * model > n and devices is None:
        # a bigger mesh than the default backend offers was requested —
        # fall back to the (possibly forced-count) host CPU devices, the
        # standard way to exercise shardings without hardware.
        try:
            cpu = np.array(jax.devices("cpu"))
            if cpu.size >= data * model:
                devs, n = cpu, cpu.size
        except RuntimeError:
            pass
    if data <= 0:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(
            f"mesh data={data} x model={model} needs {data * model} devices, "
            f"have {n}"
        )
    grid = devs[: data * model].reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))


def data_sharding(mesh: Mesh, ndim: int = 1, axis: int = 0) -> NamedSharding:
    """Shard dimension ``axis`` of an ndim-array along the 'data' mesh axis."""
    spec = [None] * ndim
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def axis_size(mesh: Mesh, name: str) -> int:
    return mesh.shape[name]
