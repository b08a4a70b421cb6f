"""End-to-end train-step tests at the tiny 64^2 config (BASELINE config 1):
one jitted iteration (both optimizer phases + EMA), the R1 variant, and the
same step sharded over the 8-device virtual mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ideas_tpu import parallel
from ideas_tpu.config import tiny_config
from ideas_tpu.train import Trainer, TrainState


@pytest.fixture(scope="module")
def trainer():
    return Trainer(tiny_config())


@pytest.fixture(scope="module")
def state0(trainer):
    return trainer.init_state(jax.random.PRNGKey(0))


def _batch(cfg, b=None):
    b = b or cfg.batch_size
    rng = np.random.default_rng(0)
    return jnp.asarray(
        rng.uniform(-1, 1, (b, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    )


def test_train_step_runs_and_updates(trainer, state0):
    x = _batch(trainer.cfg)
    step = trainer.train_step_fn(do_r1=False)
    state1, metrics = step(state0, x, jax.random.PRNGKey(1))
    assert int(state1.step) == 1
    for k in ("D_real_loss", "D_texture_loss", "D_dist_loss",
              "G_rec_loss", "G_real_loss", "G_texture_loss",
              "E_dist_loss", "E_stru_loss", "Ex_loss", "Loss_total"):
        assert np.isfinite(float(metrics[k])), k

    # every parameter group actually moved
    for group in ("E", "G", "Gstru", "Ex", "Dreal", "Dco", "Ddist"):
        before = jax.tree.leaves(state0.params[group])[0]
        after = jax.tree.leaves(state1.params[group])[0]
        assert not np.allclose(np.asarray(before), np.asarray(after)), group

    # EMA moved but stays close to old value (decay ~0.9978)
    e0 = np.asarray(jax.tree.leaves(state0.ema["G"])[0])
    e1 = np.asarray(jax.tree.leaves(state1.ema["G"])[0])
    assert not np.allclose(e0, e1)
    assert np.max(np.abs(e1 - e0)) < np.max(np.abs(e0)) + 1.0


def test_train_step_r1_variant(trainer, state0):
    x = _batch(trainer.cfg)
    step = trainer.train_step_fn(do_r1=True)
    state1, metrics = step(state0, x, jax.random.PRNGKey(2))
    for k in ("D_real_r1_loss", "D_texture_r1_loss", "D_dist_r1_loss"):
        assert k in metrics and np.isfinite(float(metrics[k])), k


def test_hide_reveal_roundtrip(trainer, state0):
    out = trainer.eval_roundtrip(state0, jax.random.PRNGKey(3))
    acc = float(out["ACC"])
    assert 0.0 <= acc <= 1.0
    assert np.isfinite(float(out["tensor_L1"]))
    # curriculum-faithful variant: container texture from E(x) pre-80%
    out2 = trainer.eval_roundtrip(state0, jax.random.PRNGKey(4),
                                  _batch(trainer.cfg))
    assert 0.0 <= float(out2["ACC"]) <= 1.0


def test_train_step_data_parallel_8dev():
    """Same step over an 8-device mesh: batch sharded, params replicated;
    gradient all-reduce is implicit in the batch-mean losses."""
    assert jax.device_count() >= 8
    cfg = tiny_config(batch_size=8)
    mesh = parallel.make_mesh()
    tr = Trainer(cfg, mesh=mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    x = parallel.shard_batch(mesh, np.asarray(_batch(cfg)))
    step = tr.train_step_fn(do_r1=True)
    state1, metrics = step(state, x, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["Loss_total"]))
    # params stay replicated (same value on every device)
    leaf = jax.tree.leaves(state1.params["G"])[0]
    assert leaf.sharding.is_fully_replicated
