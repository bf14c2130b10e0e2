"""Parallelism API: meshes, shardings, and multi-process bring-up.

The single import point for everything multi-chip:

* :func:`create_mesh` / :func:`init_distributed` — device mesh over
  ('data', 'model'), multi-host DCN bring-up,
* :func:`data_sharding` / :func:`replicated` — NamedSharding helpers,
* :func:`shard_variables` / :func:`param_spec` — parameter placement rules
  (TP for wide heads, replication elsewhere),
* :func:`make_train_step` — the DP x TP training step,
* :func:`launch_processes` — spawn N coordinated OS processes on this box
  (fresh interpreters, ``jax.distributed.initialize`` each, gloo CPU
  collectives) and run a target in every one. This is the local executable
  form of the multi-host story: the worker code path is identical to a real
  pod's (same ``init_distributed``, same global mesh, same jit programs),
  only the transport differs (localhost gloo vs ICI/DCN).

Design note: there are no hand-written collectives in the compute paths.
Parallelism is expressed as sharding annotations on jitted programs; XLA
chooses and schedules the psums/all-gathers/reduce-scatters over ICI (see
docs/ARCHITECTURE.md).
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
import time

from imageclust_tpu.core.mesh import (
    axis_size,
    create_mesh,
    data_sharding,
    init_distributed,
    replicated,
)
from imageclust_tpu.models.train import (
    make_train_step,
    param_spec,
    shard_variables,
)

__all__ = [
    "axis_size",
    "create_mesh",
    "data_sharding",
    "init_distributed",
    "replicated",
    "make_train_step",
    "param_spec",
    "shard_variables",
    "launch_processes",
]


def _free_port() -> int:
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def launch_processes(
    target: str,
    num_processes: int = 2,
    *,
    devices_per_process: int = 2,
    timeout: float = 600.0,
    env: dict | None = None,
) -> list[str]:
    """Run ``target`` ("module:function") in ``num_processes`` coordinated
    fresh interpreters on this machine.

    Each worker forces the CPU platform with ``devices_per_process`` virtual
    devices, joins a localhost coordinator through
    :func:`init_distributed` (explicit JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID), and then calls the target, which
    sees a GLOBAL ``jax.devices()`` spanning every process. Collectives are
    real cross-process exchanges (gloo).

    Returns each worker's combined stdout/stderr; raises RuntimeError with
    every failing worker's log if any exits nonzero, times out, or does not
    print the worker's OK sentinel.
    """
    port = _free_port()
    base = {
        **os.environ,
        **(env or {}),
        "IMAGECLUST_MP_TARGET": target,
        "IMAGECLUST_MP_DEVICES": str(devices_per_process),
        "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
        "JAX_NUM_PROCESSES": str(num_processes),
    }
    procs = []
    for pid in range(num_processes):
        procs.append(
            subprocess.Popen(
                [sys.executable, "-m", "imageclust_tpu.parallel._worker"],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                env={**base, "JAX_PROCESS_ID": str(pid)},
            )
        )
    deadline = time.monotonic() + timeout
    outs: list[str] = []
    failures: list[str] = []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(
                timeout=max(1.0, deadline - time.monotonic()))
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            failures.append(f"worker {pid}: TIMEOUT after {timeout}s\n{out}")
            outs.append(out)
            continue
        outs.append(out)
        if p.returncode != 0 or "IMAGECLUST_MP_OK" not in out:
            failures.append(f"worker {pid}: rc={p.returncode}\n{out}")
    if failures:
        raise RuntimeError(
            f"launch_processes({target!r}) failed:\n" + "\n---\n".join(failures)
        )
    return outs
