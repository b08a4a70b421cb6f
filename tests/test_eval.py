"""Wiring tests for the evaluation stack (random-init weights: structure
and math, not absolute parity — parity needs converted pretrained
weights, see ideas_tpu/eval/inception.py docstring)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ideas_tpu.eval import fid as fid_lib
from ideas_tpu.eval.inception import InceptionV3Features
from ideas_tpu.eval.lpips import LPIPS


def test_inception_feature_shape():
    m = InceptionV3Features(resize_input=False)
    x = jnp.zeros((2, 299, 299, 3))
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    feats = jax.jit(m.apply)(params, x)
    assert feats.shape == (2, 2048)
    assert np.isfinite(np.asarray(feats)).all()


def test_fid_math_identity_and_separation():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((500, 16)).astype(np.float64)
    b = a + 5.0
    mu_a, s_a = fid_lib.compute_stats(a)
    mu_b, s_b = fid_lib.compute_stats(b)
    assert abs(fid_lib.fid_from_stats(mu_a, s_a, mu_a, s_a)) < 1e-6
    d = fid_lib.fid_from_stats(mu_a, s_a, mu_b, s_b)
    assert abs(d - 16 * 25.0) < 1.0  # ||mu diff||^2 = 16 * 25, covs equal


def test_lpips_zero_self_distance_and_positive():
    m = LPIPS(net="alex")
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3),
                           minval=-1, maxval=1)
    y = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3),
                           minval=-1, maxval=1)
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x, y)
    d_self = jax.jit(m.apply)(params, x, x)
    d_other = jax.jit(m.apply)(params, x, y)
    np.testing.assert_allclose(np.asarray(d_self), 0.0, atol=1e-5)
    assert (np.asarray(np.abs(d_other)) > 1e-6).all()


def test_ppl_slerp_endpoints():
    from ideas_tpu.eval.ppl import slerp

    a = jnp.asarray([[1.0, 0.0]])
    b = jnp.asarray([[0.0, 1.0]])
    np.testing.assert_allclose(np.asarray(slerp(a, b, 0.0)), np.asarray(a),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(slerp(a, b, 1.0)), np.asarray(b),
                               atol=1e-5)
