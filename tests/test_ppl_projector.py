"""PPL metric and latent projector smoke tests (random-init LPIPS; these
pin wiring and math plumbing, not perceptual quality)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ideas_tpu.eval.lpips import LPIPS
from ideas_tpu.eval.ppl import compute_ppl
from ideas_tpu.models.stylegan2 import SG2Generator
from ideas_tpu.stylegan2.projector import project, get_lr, noise_regularize


SIZE = 32


@pytest.fixture(scope="module")
def gen_and_lpips():
    g = SG2Generator(size=SIZE, style_dim=32, n_mlp=2, channel_multiplier=1)
    z = jnp.zeros((2, 32))
    g_params = jax.jit(g.init)(jax.random.PRNGKey(0), [z])
    lp = LPIPS(net="alex")
    x = jnp.zeros((2, SIZE, SIZE, 3))
    lp_params = jax.jit(lp.init)(jax.random.PRNGKey(1), x, x)
    lpips_fn = jax.jit(lambda a, b: lp.apply(lp_params, a, b))
    return g, g_params, lpips_fn


def test_ppl_w_space(gen_and_lpips):
    g, g_params, lpips_fn = gen_and_lpips
    val = compute_ppl(
        g.apply, g_params, lpips_fn, jax.random.PRNGKey(2),
        n_sample=8, batch=4, space="w", style_dim=32,
    )
    # random-init LPIPS lins can be negative (trained weights are >= 0),
    # so only finiteness is pinned here.
    assert np.isfinite(val)


def test_ppl_z_space(gen_and_lpips):
    g, g_params, lpips_fn = gen_and_lpips
    val = compute_ppl(
        g.apply, g_params, lpips_fn, jax.random.PRNGKey(3),
        n_sample=8, batch=4, space="z", style_dim=32,
    )
    assert np.isfinite(val)


def test_projector_reduces_loss(gen_and_lpips):
    g, g_params, lpips_fn = gen_and_lpips
    key = jax.random.PRNGKey(4)
    target, _ = g.apply(g_params, [jax.random.normal(key, (1, 32))])
    w = g.apply(g_params, jax.random.normal(key, (64, 32)),
                method=SG2Generator.map_latent)
    mean_latent = jnp.mean(w, 0, keepdims=True)
    latent_std = float(jnp.sqrt(jnp.mean(jnp.square(w - mean_latent))))
    latent, noises, hist = project(
        g.apply, g_params, lpips_fn, mean_latent, latent_std,
        jax.lax.stop_gradient(target), num_layers=g.n_latent,
        key=key, steps=120, initial_lr=0.1,
    )
    assert latent.shape == (1, 32)
    assert len(hist) == 1  # one 100-step log entry
    assert np.isfinite(hist[0][1])


def test_projector_helpers():
    assert get_lr(0.0, 1.0) == 0.0
    assert get_lr(0.5, 1.0) == pytest.approx(1.0)
    noises = [jnp.ones((1, 16, 16, 1))]
    assert np.isfinite(float(noise_regularize(noises)))
