"""Warm ONLY the spatial (data,space)-mesh compile-cache entry of the
multi-chip gate (phase 2 of __graft_entry__._dryrun_multichip_impl).

The full `warm` CLI re-executes the dp step (~350-430 s, not cacheable)
and can trip the 420 s guard before reaching the spatial compile on a
contended host — exactly what happened on the first post-recycle warm.
This script mirrors the gate's env + shapes but skips the dp execute,
so the sp trace+compile lands in the cache deterministically.
"""
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from ideas_tpu import parallel
from ideas_tpu.config import tiny_config
from ideas_tpu.train import Trainer

n_devices = 8
devices = jax.devices()[:n_devices]
cfg = tiny_config(
    batch_size=n_devices, image_size=64, channel=4, texture_channel=64,
    n_crop=1, ref_crop=1,
)
batch = (
    np.random.default_rng(0)
    .uniform(-1, 1, (cfg.batch_size, cfg.image_size, cfg.image_size, 3))
    .astype(np.float32)
)
mesh_sp = parallel.make_mesh(devices=devices, spatial_devices=2)
trainer_sp = Trainer(cfg, mesh=mesh_sp)
state_sp = jax.device_put(
    trainer_sp.init_state(jax.random.PRNGKey(0)), parallel.replicated(mesh_sp)
)
x_sp = parallel.shard_batch(mesh_sp, batch)
lowered_sp = trainer_sp.train_step_fn(do_r1=True).lower(
    state_sp, x_sp, jax.random.PRNGKey(1)
)
print("sp lowered", flush=True)
lowered_sp.compile()
print("WARM_SP_OK", flush=True)
