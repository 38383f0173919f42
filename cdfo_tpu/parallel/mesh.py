"""Device-mesh and sharding helpers (the reference's latent NCCL/DistSampler
distributed layer — `opt/deep_learning.py:23-141` — rebuilt as first-class
jax.sharding over ICI).

Data parallelism: batch axis sharded over the 'data' mesh axis; gradients
all-reduce over ICI automatically under jit. Spatial parallelism for
large-frame inference shards H over a 'spatial' axis (the temporal/CP analog
discussed in SURVEY §2.7).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host runtime init — the reference's ``init_dist`` (NCCL
    ``init_process_group`` + spawn, `opt/deep_learning.py:23-26`) rebuilt
    on ``jax.distributed.initialize``.

    On TPU pods every argument auto-detects from the environment; on CPU
    fleets pass the coordinator address + process ids explicitly.
    Idempotent (a second call is a no-op). Returns
    ``(process_index, process_count)`` — the ``get_dist_info`` equivalent
    (`opt/deep_learning.py:29-42`) — which feed straight into
    ``CVCPDataset(host_id=..., num_hosts=...)`` for per-host input
    sharding (the ``DistSampler`` replacement).
    """
    import os

    import jax

    if not jax.distributed.is_initialized():
        if (num_processes or 0) > 1 and "cpu" in os.environ.get(
                "JAX_PLATFORMS", ""):
            # CPU fleets: cross-process collectives need the Gloo backend
            # (proved end-to-end by tests/test_multiprocess_dist.py)
            try:
                jax.config.update("jax_cpu_collectives_implementation",
                                  "gloo")
            except Exception:  # pragma: no cover - older jaxlib
                pass
        # must precede ANY backend-initialising jax call (jax.devices etc.)
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_index(), jax.process_count()


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),)
    n = int(np.prod(shape))
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, axis_names)


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Place a host batch on the mesh, sharding the leading axis."""

    def _shard(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(_shard, tree)


def replicate(mesh: Mesh, tree):
    def _rep(x):
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(_rep, tree)


def batch_spec(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def spatial_spec(mesh: Mesh, ndim: int, h_axis_index: int,
                 axis: str = "spatial") -> NamedSharding:
    spec = [None] * ndim
    spec[h_axis_index] = axis
    return NamedSharding(mesh, P(*spec))
