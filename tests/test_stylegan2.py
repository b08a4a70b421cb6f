"""StyleGAN2 side-tree tests: generator/discriminator shapes, style
mixing/truncation, one DP train step, ADA augmentation sanity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ideas_tpu.models.stylegan2 import SG2Generator, SG2Discriminator
from ideas_tpu.stylegan2.train import SG2Config, SG2Trainer
from ideas_tpu.stylegan2.non_leaking import augment, sample_affine, apply_affine


SIZE = 32
KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def gen():
    g = SG2Generator(size=SIZE, style_dim=32, n_mlp=2, channel_multiplier=1)
    z = jnp.zeros((2, 32))
    params = jax.jit(g.init)(KEY, [z])
    return g, params


def test_generator_shapes_and_mixing(gen):
    g, params = gen
    z1 = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
    z2 = jax.random.normal(jax.random.PRNGKey(2), (2, 32))
    img, _ = jax.jit(lambda p, z: g.apply(p, z))(params, [z1])
    assert img.shape == (2, SIZE, SIZE, 3)
    img2, lat = g.apply(params, [z1, z2], inject_index=3, return_latents=True)
    assert img2.shape == (2, SIZE, SIZE, 3)
    assert lat.shape == (2, g.n_latent, 32)
    # mixing actually changes the output
    img1, _ = g.apply(params, [z1])
    assert not np.allclose(np.asarray(img1), np.asarray(img2))


def test_generator_truncation(gen):
    g, params = gen
    z = jax.random.normal(jax.random.PRNGKey(3), (2, 32))
    mean_w = g.apply(params, jax.random.PRNGKey(4), 64, method=SG2Generator.mean_latent)
    img_full, _ = g.apply(params, [z])
    img_trunc, _ = g.apply(params, [z], truncation=0.5, truncation_latent=mean_w)
    assert not np.allclose(np.asarray(img_full), np.asarray(img_trunc))


def test_discriminator_minibatch_stddev(gen):
    d = SG2Discriminator(size=SIZE, channel_multiplier=1)
    x = jax.random.normal(jax.random.PRNGKey(5), (4, SIZE, SIZE, 3))
    params = jax.jit(d.init)(KEY, x)
    out = d.apply(params, x)
    assert out.shape == (4, 1)


def test_sg2_train_step():
    cfg = SG2Config(size=SIZE, style_dim=32, n_mlp=2, channel_multiplier=1,
                    batch_size=4)
    tr = SG2Trainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, SIZE, SIZE, 3),
                           minval=-1, maxval=1)
    step = tr.step_fn(do_r1=True, do_path=True)
    state1, metrics = step(state, x, jax.random.PRNGKey(2))
    for k in ("d", "g", "r1", "path"):
        assert np.isfinite(float(metrics[k])), k
    assert int(state1.step) == 1
    g0 = jax.tree.leaves(state.g_params)[0]
    g1 = jax.tree.leaves(state1.g_params)[0]
    assert not np.allclose(np.asarray(g0), np.asarray(g1))


def test_ada_identity_affine_roundtrip():
    """p=0 leaves the image nearly unchanged (wavelet up/down identity)."""
    img = jax.random.uniform(jax.random.PRNGKey(7), (2, SIZE, SIZE, 3),
                             minval=-1, maxval=1)
    G_inv = jnp.eye(3)[None].repeat(2, 0)
    out = apply_affine(img, G_inv)
    assert out.shape == img.shape
    err = np.max(np.abs(np.asarray(out) - np.asarray(img)))
    assert err < 0.05, f"identity warp error {err}"


def test_ada_augment_runs_and_p_gates():
    img = jax.random.uniform(jax.random.PRNGKey(8), (2, SIZE, SIZE, 3),
                             minval=-1, maxval=1)
    out0 = augment(jax.random.PRNGKey(9), img, p=0.0)
    # p=0: only the resampling identity path, no transforms
    np.testing.assert_allclose(np.asarray(out0), np.asarray(img), atol=0.05)
    out1 = augment(jax.random.PRNGKey(9), img, p=1.0)
    assert np.isfinite(np.asarray(out1)).all()
    assert not np.allclose(np.asarray(out1), np.asarray(img), atol=0.1)


def test_sg2_train_step_data_parallel_8dev():
    """SG2 trainer over the 8-device mesh: batch sharded, params
    replicated, full step (R1 + path reg) compiles and executes —
    the side tree's DDP-parity datapoint (stylegan2/train.py:425-438)."""
    from ideas_tpu import parallel

    assert jax.device_count() >= 8
    cfg = SG2Config(size=SIZE, style_dim=32, n_mlp=2, channel_multiplier=1,
                    batch_size=8)
    mesh = parallel.make_mesh()
    tr = SG2Trainer(cfg, mesh=mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    x = parallel.shard_batch(
        mesh,
        np.random.default_rng(0)
        .uniform(-1, 1, (8, SIZE, SIZE, 3)).astype(np.float32),
    )
    step = tr.step_fn(do_r1=True, do_path=True)
    state1, metrics = step(state, x, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["d"]))
    assert np.isfinite(float(metrics["g"]))
    leaf = jax.tree.leaves(state1.g_params)[0]
    assert leaf.sharding.is_fully_replicated
