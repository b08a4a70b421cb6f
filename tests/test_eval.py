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


def _pin_input(h=64):
    yy, xx = np.mgrid[0:h, 0:h].astype(np.float32) / (h - 1)
    img0 = np.stack([np.sin(6 * xx), np.cos(4 * yy), xx * yy * 2 - 1], -1)[None]
    img1 = np.stack([np.cos(5 * xx * yy), xx * 2 - 1, np.sin(3 * yy)], -1)[None]
    return jnp.asarray(np.concatenate([img0, img1]))


def test_inception_activation_constants():
    """Pin the InceptionV3 port (SURVEY §4(f)): fixed-seed params on a
    fixed input must reproduce recorded activations — catches any silent
    change to pooling flags, padding, or the fixed-params derivation."""
    from ideas_tpu.eval.inception import fixed_params

    want = np.load("tests/data/eval_constants.npz")
    x = _pin_input()
    f = np.asarray(jax.jit(
        lambda x: InceptionV3Features().apply(fixed_params(64), x))(x))
    np.testing.assert_allclose(f[:, :64], want["incep_head"],
                               rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(f.mean(1), want["incep_mean"], rtol=1e-3)
    np.testing.assert_allclose(f.std(1), want["incep_std"], rtol=1e-3)


def test_lpips_activation_constants():
    """Pin the LPIPS port with the OFFICIAL packaged lin heads over the
    fixed-seed backbone — recorded distances for both nets."""
    from ideas_tpu.eval.lpips import fixed_params

    want = np.load("tests/data/eval_constants.npz")
    x = _pin_input()
    for net, key in (("vgg", "lpips_vgg"), ("alex", "lpips_alex")):
        d = np.asarray(jax.jit(
            lambda a, b, net=net: LPIPS(net=net).apply(fixed_params(net, 64), a, b)
        )(x[:1], x[1:]))
        np.testing.assert_allclose(d, want[key], rtol=1e-4, err_msg=net)


def test_lpips_packaged_linears_are_official():
    """The committed lin-head npz must match the reference-vendored .pth
    values bit-for-bit when that file is present (CI has it mounted)."""
    import os

    from ideas_tpu.eval.lpips import packaged_linear_path

    pth = "/root/reference/stylegan2/lpips/weights/v0.1/vgg.pth"
    if not os.path.exists(pth):
        pytest.skip("reference weights not mounted")
    torch = pytest.importorskip("torch")
    sd = torch.load(pth, map_location="cpu")
    ours = dict(np.load(packaged_linear_path("vgg")))
    for k, v in sd.items():
        np.testing.assert_array_equal(ours[k], v.numpy(), err_msg=k)


def test_ppl_slerp_endpoints():
    from ideas_tpu.eval.ppl import slerp

    a = jnp.asarray([[1.0, 0.0]])
    b = jnp.asarray([[0.0, 1.0]])
    np.testing.assert_allclose(np.asarray(slerp(a, b, 0.0)), np.asarray(a),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(slerp(a, b, 1.0)), np.asarray(b),
                               atol=1e-5)
