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
