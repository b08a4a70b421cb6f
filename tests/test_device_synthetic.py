"""On-device synthetic data generation (data/device_synthetic.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from ideas_tpu.config import tiny_config
from ideas_tpu.data.device_synthetic import make_device_data_fn, synthetic_batch
from ideas_tpu.train import Trainer


def test_synthetic_batch_shape_and_range():
    x = synthetic_batch(jax.random.PRNGKey(0), 4, 64)
    assert x.shape == (4, 64, 64, 3)
    assert x.dtype == jnp.float32
    assert float(x.min()) >= -1.0 and float(x.max()) <= 1.0


def test_synthetic_batch_is_structure_rich():
    # Different keys -> different images, and images are not explainable
    # by a global statistic alone: per-image spatial variance stays high
    # (the structure-collapse guard, see pipeline.SyntheticDataset).
    a = synthetic_batch(jax.random.PRNGKey(1), 2, 64)
    b = synthetic_batch(jax.random.PRNGKey(2), 2, 64)
    assert float(jnp.mean(jnp.abs(a - b))) > 0.05
    spatial_var = jnp.var(a, axis=(1, 2)).mean()
    assert float(spatial_var) > 0.01
    # samples within one batch differ too
    assert float(jnp.mean(jnp.abs(a[0] - a[1]))) > 0.05


def test_train_step_with_device_data_fn():
    cfg = tiny_config(batch_size=2)
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    step = trainer.train_step_fn(
        do_r1=False,
        device_data_fn=make_device_data_fn(cfg.batch_size, cfg.image_size),
    )
    new_state, metrics = step(state)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["Loss_total"]))
    # rng advanced (data key consumed + step's own split)
    assert not np.array_equal(np.asarray(new_state.rng), np.asarray(state.rng))


def test_rich_family_traces_and_is_higher_entropy():
    """'rich' family (round-2 delta-experiment): rasterizes in-trace,
    stays in [-1, 1], and carries more boundary structure than the
    default family (edge-density proxy)."""
    import numpy as np

    from ideas_tpu.data.device_synthetic import synthetic_batch

    rich = np.asarray(synthetic_batch(jax.random.PRNGKey(0), 4, 64, 0, "rich"))
    base = np.asarray(synthetic_batch(jax.random.PRNGKey(0), 4, 64))
    assert rich.shape == base.shape == (4, 64, 64, 3)
    assert rich.min() >= -1.0 and rich.max() <= 1.0
    assert np.isfinite(rich).all()

    def edge_density(a):
        return (np.abs(np.diff(a, axis=1)).mean()
                + np.abs(np.diff(a, axis=2)).mean())

    assert edge_density(rich) > edge_density(base)
