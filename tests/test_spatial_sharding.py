"""Spatial (image-height) sharding over a 2-D (data, space) mesh.

256^2+ activations can exceed one chip's HBM at large batch; sharding
NHWC axis 1 over ICI neighbors lets XLA's SPMD partitioner insert conv
halo exchanges automatically (SURVEY.md section 5's honest TPU analogue
of "scale the big dimension"). These tests pin (a) one full train step
on a (2, 4) mesh and (b) numerical parity of a sharded forward against
single-device execution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ideas_tpu import parallel
from ideas_tpu.config import tiny_config
from ideas_tpu.models import init_model
from ideas_tpu.train import Trainer

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)


def _cfg():
    return tiny_config(batch_size=2, image_size=64, channel=4,
                       texture_channel=64, n_crop=2, ref_crop=2)


def test_make_mesh_2d_shape():
    mesh = parallel.make_mesh(spatial_devices=4)
    assert dict(mesh.shape) == {"data": 2, "space": 4}
    sh = parallel.batch_sharding(mesh)
    assert sh.spec == jax.sharding.PartitionSpec("data", "space")


def test_train_step_on_spatial_mesh():
    mesh = parallel.make_mesh(spatial_devices=4)  # (2, 4)
    cfg = _cfg()
    trainer = Trainer(cfg, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    x = parallel.shard_batch(
        mesh,
        np.random.default_rng(0)
        .uniform(-1, 1, (cfg.batch_size, cfg.image_size, cfg.image_size, 3))
        .astype(np.float32),
    )
    step = trainer.train_step_fn(do_r1=False)
    new_state, metrics = step(state, x, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["Loss_total"]))
    assert int(new_state.step) == 1


def test_spatial_forward_matches_single_device():
    # E(x) then G(S, T): same math under (data, space) sharding as on one
    # device (collectives only reorder reductions). Requires the ambient
    # mesh so deep low-resolution activations leave the `space` axis —
    # XLA's halo exchange is wrong on sub-window shards (PERF.md).
    cfg = _cfg()
    E = init_model("DisentanglementEncoder", cfg)
    G = init_model("Generator", cfg)
    k = jax.random.PRNGKey(0)
    x = jax.random.uniform(
        k, (cfg.batch_size, cfg.image_size, cfg.image_size, 3),
        jnp.float32, -1, 1,
    )
    parallel.set_ambient_mesh(None)
    pE = jax.jit(E.init)(k, x)
    s, t = jax.jit(E.apply)(pE, x)
    pG = jax.jit(G.init)(k, s, t)

    def fwd(x):
        s, t = E.apply(pE, x)
        return G.apply(pG, s, t)

    ref = np.asarray(jax.jit(fwd)(x))

    mesh = parallel.make_mesh(spatial_devices=4)
    parallel.set_ambient_mesh(mesh)
    try:
        xs = parallel.shard_batch(mesh, np.asarray(x))
        out = np.asarray(jax.jit(fwd)(xs))
    finally:
        parallel.set_ambient_mesh(None)
    np.testing.assert_allclose(ref, out, atol=2e-4, rtol=2e-4)
