"""Parallelism API: meshes, shardings, collectives-by-annotation.

The single import point for everything multi-chip:

* :func:`create_mesh` / :func:`init_distributed` — device mesh over
  ('data', 'model'), multi-host DCN bring-up,
* :func:`data_sharding` / :func:`replicated` — NamedSharding helpers,
* :func:`shard_variables` / :func:`param_spec` — parameter placement rules
  (TP for wide heads, replication elsewhere),
* :func:`make_train_step` — the DP x TP training step.

Design note: there are no hand-written collectives here. Parallelism is
expressed as sharding annotations on jitted programs; XLA chooses and
schedules the psums/all-gathers/reduce-scatters over ICI (see
docs/ARCHITECTURE.md). The Pallas ring-collective toolbox
(jax.experimental.pallas tpu RDMA) remains available for kernels that need
manual overlap, but nothing in the current pipelines requires it.
"""

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
]
