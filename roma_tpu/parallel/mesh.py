"""Device mesh + sharding helpers.

The reference's only parallelism is DDP gradient all-reduce over NCCL
(train_roma_outdoor.py:170,232). The TPU-native equivalent: a
`jax.sharding.Mesh` with a `data` axis (and a reserved `model` axis for
sharding the correlation/GP token dimension if resolutions grow), batches
sharded over `data`, parameters replicated, and XLA inserting the gradient
psum during jit — collectives ride ICI, no hand-written NCCL calls.
"""

from __future__ import annotations

import os

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


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> tuple[int, int]:
    """Multi-host bootstrap — the torchrun/`dist.init_process_group('nccl')`
    equivalent (reference train_roma_outdoor.py:170-180, train.sh:9).

    With no arguments, reads the standard JAX cluster env vars
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID, or the TPU-pod
    metadata on Cloud TPU) via `jax.distributed.initialize`'s auto
    detection; single-process runs skip initialization entirely. Returns
    (process_index, process_count).
    """
    explicit = coordinator_address is not None
    env_driven = "COORDINATOR_ADDRESS" in os.environ
    if explicit or env_driven:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def global_batch_from_host_local(batch, mesh: Mesh):
    """Assemble a mesh-global, data-sharded batch from each host's local
    shard (replaces the reference's rank-striped DataLoader: each host loads
    only its slice; the global array spans hosts without any host ever
    holding the full batch). Single-process: equivalent to `shard_batch`."""
    s = NamedSharding(mesh, P("data"))
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)), batch
    )
