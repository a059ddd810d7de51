"""Device mesh + sharding helpers.

The reference's only parallelism is DDP gradient all-reduce over NCCL
(train_roma_outdoor.py:170,232). The TPU-native equivalent: a
`jax.sharding.Mesh` with a `data` axis (and a reserved `model` axis for
sharding the correlation/GP token dimension if resolutions grow), batches
sharded over `data`, parameters replicated, and XLA inserting the gradient
psum during jit — collectives ride ICI, no hand-written NCCL calls.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None or n_data < 0:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def shard_batch(batch, mesh: Mesh):
    """Shard every array's leading (batch) axis over the `data` mesh axis."""
    s = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params, opt state) over the mesh."""
    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
