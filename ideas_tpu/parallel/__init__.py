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
SPACE_AXIS = "space"


def make_mesh(num_devices: int = 0, devices=None,
              spatial_devices: int = 1) -> Mesh:
    """A device mesh for the trainer.

    `spatial_devices=1` (default): 1-D data-parallel mesh over
    `num_devices` chips (0 = all visible).

    `spatial_devices=S>1`: 2-D (data, space) mesh — batches are sharded
    over `data` AND activations are sharded along image height over
    `space`. XLA's SPMD partitioner inserts the conv halo exchanges and
    the pooling/collective reductions automatically, so 256^2+
    activations that would not fit one chip's HBM spread over ICI
    neighbors (the TPU-native answer to "scale the big dimension",
    SURVEY.md section 5)."""
    if devices is None:
        devices = jax.devices()
    if num_devices:
        devices = devices[: num_devices * spatial_devices]
    devices = np.asarray(devices)
    if spatial_devices > 1:
        if devices.size % spatial_devices:
            raise ValueError(
                f"{devices.size} devices not divisible by "
                f"spatial_devices={spatial_devices}"
            )
        grid = devices.reshape(devices.size // spatial_devices, spatial_devices)
        return Mesh(grid, (DATA_AXIS, SPACE_AXIS))
    return Mesh(devices, (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Input-batch sharding: batch over `data`, and — on a 2-D mesh —
    image height (NHWC axis 1) over `space`."""
    if SPACE_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch onto the mesh: leading axis over `data`, and
    (2-D mesh, rank>=2 leaves) height over `space`.

    Single-process: a plain sharded device_put. Multi-process (the mesh
    spans `jax.distributed` processes): each process passes its LOCAL
    shard of the batch and the leaves are assembled into global arrays —
    the data-loader contract of the reference's DDP sampler
    (`/root/reference/stylegan2/train.py:425-438`), mesh-native."""
    multiprocess = jax.process_count() > 1

    def put(a):
        if SPACE_AXIS in mesh.axis_names and getattr(a, "ndim", 0) >= 2:
            spec = P(DATA_AXIS, SPACE_AXIS)
        else:
            spec = P(DATA_AXIS)
        sharding = NamedSharding(mesh, spec)
        if multiprocess:
            a = np.asarray(a)
            global_shape = (a.shape[0] * jax.process_count(),) + a.shape[1:]
            return jax.make_array_from_process_local_data(
                sharding, a, global_shape
            )
        return jax.device_put(a, sharding)

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    return jax.device_put(tree, replicated(mesh))


# --- ambient mesh: spatial-sharding hints inside model code -----------------
#
# XLA's SPMD partitioner mis-computes conv halo exchanges when a shard's
# spatial extent is smaller than the conv window (observed: VALID 3x3
# stride-2 conv on H=4 split 4-ways returns wrong values, 2026-08).
# Layers therefore drop the `space` axis once the per-shard height gets
# close to the window size — those deep low-resolution activations are
# tiny, so replicating them over `space` costs ~nothing while the big
# early layers keep the height sharding. Models reach the active mesh
# through this ambient global (set by Trainer) instead of threading it
# through every flax module.

_AMBIENT_MESH: Optional[Mesh] = None

# Per-shard height below which activations leave the `space` axis. 8 =
# the largest halo a layer needs (4-tap blur on a 2x-upsampled input)
# with safety margin; heights at or above image_size/16 stay sharded for
# space_devices <= 2 at 256^2 and the framework enforces nothing smaller.
MIN_ROWS_PER_SHARD = 8


def set_ambient_mesh(mesh: Optional[Mesh]) -> None:
    global _AMBIENT_MESH
    _AMBIENT_MESH = mesh


def get_ambient_mesh() -> Optional[Mesh]:
    return _AMBIENT_MESH


def auto_spatial_constraint(x):
    """Inside-jit sharding hint for NHWC activations.

    No-op unless an ambient 2-D (data, space) mesh is set. Keeps height
    sharded over `space` while every shard still holds >=
    MIN_ROWS_PER_SHARD rows; below that, constrains to data-only
    (replicated over `space`) so conv halo exchanges never operate on
    sub-window shards."""
    mesh = _AMBIENT_MESH
    if mesh is None or SPACE_AXIS not in mesh.axis_names or x.ndim != 4:
        return x
    n_space = mesh.shape[SPACE_AXIS]
    if x.shape[1] >= MIN_ROWS_PER_SHARD * n_space:
        spec = P(DATA_AXIS, SPACE_AXIS)
    else:
        spec = P(DATA_AXIS)
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


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


def maybe_initialize_distributed() -> bool:
    """Multi-host init (the `init_process_group` analogue,
    `/root/reference/stylegan2/train.py:370-373`). Returns True iff
    `jax.distributed.initialize()` was called.

    Must run BEFORE anything touches the backend (`jax.devices()`,
    `jax.process_count()`, any dispatch): those calls initialize the
    local backend and make a later distributed init a no-op/error. So
    the gate is coordinator env vars only — never a backend query — and
    errors propagate (a half-initialized multi-host job must die loudly,
    not limp on as 1-host)."""
    import os

    # Only JAX-recognized coordinator variables: the generic
    # COORDINATOR_ADDRESS is used by unrelated orchestrators and would
    # trigger a doomed initialize() on plain single-host boxes.
    coordinator_vars = (
        "JAX_COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS",
    )
    if not any(v in os.environ for v in coordinator_vars):
        return False  # single-host: plain local backend
    # jax.distributed.initialize() reads JAX_COORDINATOR_ADDRESS itself
    # but sources num_processes/process_id only from cluster plugins
    # (SLURM/OMPI/TPU metadata). Support plain env-var launches too —
    # the exact analogue of torch's `init_method="env://"` reading
    # WORLD_SIZE/RANK (`/root/reference/stylegan2/train.py:370-373`,
    # launched by torch.distributed.launch which sets those vars).
    num = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    jax.distributed.initialize(
        num_processes=int(num) if num is not None else None,
        process_id=int(pid) if pid is not None else None,
    )
    return True
