"""Checkpoint/resume contract (reference: one blob with iter + all model
and optimizer slots, `train.py:307-320,434-442`) via orbax."""

import numpy as np
import jax
import jax.numpy as jnp

from ideas_tpu.checkpoint import CheckpointManager
from ideas_tpu.config import tiny_config
from ideas_tpu.train import Trainer


def test_save_restore_roundtrip(tmp_path):
    cfg = tiny_config(image_size=64, channel=4)
    tr = Trainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0))
    state = state.replace(step=jnp.asarray(7, jnp.int32))

    mngr = CheckpointManager(str(tmp_path / "ckpt"))
    mngr.save(7, jax.device_get(state))
    assert mngr.latest_step() == 7

    # restore into a template built from a different seed
    template = tr.init_state(jax.random.PRNGKey(1))
    restored = mngr.restore(template)
    assert int(restored.step) == 7

    want = jax.tree.leaves(state.params)
    got = jax.tree.leaves(restored.params)
    assert len(want) == len(got)
    for a, b in zip(want, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state round-trips too (the reference restores optimizers
    # through the same dict loop)
    for a, b in zip(jax.tree.leaves(state.opt_g), jax.tree.leaves(restored.opt_g)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_save_restore_roundtrip_compact_adam(tmp_path):
    """compact_adam flips the opt-state pytree structure (second moment
    only, ideas_tpu/optim.py) — a run trained with the flag must resume
    from its own checkpoints, and the restored state must keep training
    (the supervisor restart path of the round-3 80k run)."""
    cfg = tiny_config(image_size=64, channel=4, compact_adam=True)
    tr = Trainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(0).uniform(
            -1, 1, (cfg.batch_size, cfg.image_size, cfg.image_size, 3)
        ),
        jnp.float32,
    )
    step = tr.train_step_fn(do_r1=False)
    state, _ = step(state, x, jax.random.PRNGKey(1))

    mngr = CheckpointManager(str(tmp_path / "ckpt"))
    mngr.save(1, jax.device_get(state))
    template = tr.init_state(jax.random.PRNGKey(2))
    restored = mngr.restore(template)
    for a, b in zip(jax.tree.leaves(state.opt_g), jax.tree.leaves(restored.opt_g)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the restored state steps (structure matches the compiled step)
    restored, metrics = step(restored, x, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["Loss_total"]))


def test_all_steps_and_rotation(tmp_path):
    """all_steps enumerates retained checkpoints; max_to_keep=None keeps
    every save (the --keep_checkpoints 0 trajectory mode), the default
    rotates."""
    state = {"step": jnp.asarray(0, jnp.int32), "w": jnp.ones((3,))}

    keep_all = CheckpointManager(str(tmp_path / "all"), max_to_keep=None)
    for s in (5, 10, 15, 20):
        keep_all.save(s, {**state, "step": jnp.asarray(s, jnp.int32)})
    assert keep_all.all_steps() == [5, 10, 15, 20]

    rotating = CheckpointManager(str(tmp_path / "rot"), max_to_keep=2)
    for s in (5, 10, 15):
        rotating.save(s, {**state, "step": jnp.asarray(s, jnp.int32)})
    assert rotating.all_steps() == [10, 15]
    assert rotating.latest_step() == 15
    restored = rotating.restore({**state})
    assert int(restored["step"]) == 15
