"""Device mesh + sharding helpers (the TPU-native replacement for the
reference's NCCL DDP stack, `stylegan2/distributed.py` + DDP wrapping in
`stylegan2/train.py:425-438`).

Design (SURVEY.md section 2.3): a 1-D `jax.sharding.Mesh` over all chips;
batches are sharded on the leading axis, parameters are replicated, and
XLA inserts the gradient all-reduce (the DDP allreduce) automatically
because the loss is a cross-shard mean. `psum`/`all_gather` wrappers are
provided for explicit-collective code (shard_map users); multi-host
training initializes `jax.distributed` so ICI carries intra-slice traffic
and DCN carries cross-slice traffic with no further code.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int = 0, devices=None) -> Mesh:
    """A 1-D data-parallel mesh. num_devices=0 means all visible devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch onto the mesh, sharded along axis 0."""
    return jax.device_put(batch, batch_sharding(mesh))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    return jax.device_put(tree, replicated(mesh))


# Explicit collectives for shard_map-style code, mirroring
# stylegan2/distributed.py's wrappers.


def reduce_sum(x, axis_name: str = DATA_AXIS):
    """all-reduce sum (== distributed.reduce_sum, `distributed.py:44-54`)."""
    return jax.lax.psum(x, axis_name)


def reduce_mean(x, axis_name: str = DATA_AXIS):
    return jax.lax.pmean(x, axis_name)


def all_gather(x, axis_name: str = DATA_AXIS):
    """gather along a new leading axis (== distributed.all_gather,
    `distributed.py:69-101`, minus the pickle hack — arrays only)."""
    return jax.lax.all_gather(x, axis_name)


def reduce_loss_dict(losses: dict, axis_name: str = DATA_AXIS) -> dict:
    """Cross-replica mean of every entry (== `distributed.py:104-126`)."""
    return {k: jax.lax.pmean(v, axis_name) for k, v in losses.items()}


def maybe_initialize_distributed():
    """Multi-host init (no-op on a single host)."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        import os

        if "JAX_COORDINATOR_ADDRESS" in os.environ or "MEGASCALE_COORDINATOR_ADDRESS" in os.environ:
            jax.distributed.initialize()
    except Exception:
        pass
