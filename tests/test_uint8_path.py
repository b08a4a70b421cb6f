"""uint8 device-side preprocessing path (train_step_uint8_fn + raw loader)."""

import jax
import jax.numpy as jnp
import numpy as np

from ideas_tpu.config import tiny_config
from ideas_tpu.data.pipeline import SyntheticDataset, data_iterator, _to_float_batch
from ideas_tpu.train import Trainer


def test_raw_iterator_yields_uint8_and_mask():
    ds = SyntheticDataset(64, length=8)
    it = data_iterator(ds, batch_size=4, seed=0, raw=True)
    u8, flips = next(it)
    assert u8.dtype == np.uint8 and u8.shape == (4, 64, 64, 3)
    assert flips.dtype == np.bool_ and flips.shape == (4,)


def test_uint8_step_matches_float_step():
    # Same state (same state.rng) + the same images must produce
    # identical metrics whether normalize/flip ran on host or on device.
    cfg = tiny_config(batch_size=2)
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))

    ds = SyntheticDataset(cfg.image_size, length=4)
    u8 = np.stack([ds[0], ds[1]])
    flips = np.array([True, False])
    x_float = _to_float_batch(u8, flips)

    step_f = trainer.train_step_fn(do_r1=False)
    step_u = trainer.train_step_uint8_fn(do_r1=False)
    _, m_f = step_f(state, jnp.asarray(x_float))
    _, m_u = step_u(state, jnp.asarray(u8), jnp.asarray(flips))
    for k in m_f:
        np.testing.assert_allclose(
            float(m_f[k]), float(m_u[k]), rtol=1e-5, atol=1e-6, err_msg=k
        )
