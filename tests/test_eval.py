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


def test_fid_from_stats_known_gaussians():
    """Frechet arithmetic pinned against hand-computable Gaussians —
    the one formula in the eval stack a typo could silently corrupt
    (`fid.py:54-76` vs `/root/reference/stylegan2/fid.py:34-57`)."""
    # Diagonal case: sqrtm(S1 @ S2) = diag(3, 8).
    # FID = ||mu||^2 + tr S1 + tr S2 - 2 tr sqrt = 10 + 5 + 25 - 22 = 18.
    mu1, s1 = np.zeros(2), np.diag([1.0, 4.0])
    mu2, s2 = np.array([3.0, -1.0]), np.diag([9.0, 16.0])
    assert fid_lib.fid_from_stats(mu1, s1, mu2, s2) == pytest.approx(18.0, abs=1e-8)
    # Symmetric in its arguments (tr sqrt(S1 S2) = tr sqrt(S2 S1)).
    assert fid_lib.fid_from_stats(mu2, s2, mu1, s1) == pytest.approx(18.0, abs=1e-8)
    # Non-commuting covariances: cross-check against the independent
    # symmetric closed form tr(S1 + S2 - 2 (S1^{1/2} S2 S1^{1/2})^{1/2}),
    # computed via eigendecomposition (no scipy.sqrtm shared with the
    # implementation under test).
    import numpy.linalg as la

    rng = np.random.default_rng(7)
    a = rng.standard_normal((4, 4))
    b = rng.standard_normal((4, 4))
    s1 = a @ a.T + 0.5 * np.eye(4)
    s2 = b @ b.T + 0.5 * np.eye(4)
    mu1 = rng.standard_normal(4)
    mu2 = rng.standard_normal(4)

    def psd_sqrt(m):
        w, v = la.eigh(m)
        return (v * np.sqrt(np.clip(w, 0, None))) @ v.T

    r1 = psd_sqrt(s1)
    inner = psd_sqrt(r1 @ s2 @ r1)
    expected = float(
        (mu1 - mu2) @ (mu1 - mu2)
        + np.trace(s1) + np.trace(s2) - 2.0 * np.trace(inner)
    )
    got = fid_lib.fid_from_stats(mu1, s1, mu2, s2)
    assert got == pytest.approx(expected, rel=1e-9, abs=1e-9)


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


@pytest.mark.parametrize("net", ["vgg", "alex", "squeeze"])
def test_lpips_packaged_linears_are_official(net):
    """The committed lin-head npz must match the reference-vendored .pth
    values bit-for-bit when that file is present (CI has it mounted)."""
    import os

    from ideas_tpu.eval.lpips import packaged_linear_path

    pth = f"/root/reference/stylegan2/lpips/weights/v0.1/{net}.pth"
    if not os.path.exists(pth):
        pytest.skip("reference weights not mounted")
    torch = pytest.importorskip("torch")
    sd = torch.load(pth, map_location="cpu")
    ours = dict(np.load(packaged_linear_path(net)))
    assert len(ours) == len(sd)
    for k, v in sd.items():
        np.testing.assert_array_equal(ours[k], v.numpy(), err_msg=k)


def test_l2_and_dssim_fallback_metrics():
    """The reference's FakeNet L2/DSSIM fallbacks
    (`lpips/networks_basic.py:144-180`). DSSIM is pinned against an
    independent numpy implementation on skimage's own backend
    (scipy.ndimage.uniform_filter + edge crop, unbiased covariance)."""
    from scipy.ndimage import uniform_filter

    from ideas_tpu.eval.lpips import dssim_distance, l2_distance

    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.2, x.shape), -1, 1).astype(np.float32)

    got_l2 = np.asarray(l2_distance(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(
        got_l2, ((x - y) ** 2).mean(axis=(1, 2, 3)), rtol=1e-5)
    assert np.allclose(np.asarray(l2_distance(jnp.asarray(x), jnp.asarray(x))), 0)

    def ssim_ref(a, b):  # per-image scalar, skimage compare_ssim semantics
        a = (a + 1.0) * 127.5
        b = (b + 1.0) * 127.5
        c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
        vals = []
        for ch in range(a.shape[-1]):
            p, q = a[..., ch].astype(np.float64), b[..., ch].astype(np.float64)
            f = lambda m: uniform_filter(m, size=7)
            up, uq = f(p), f(q)
            cov_norm = 49.0 / 48.0
            vp = cov_norm * (f(p * p) - up * up)
            vq = cov_norm * (f(q * q) - uq * uq)
            vpq = cov_norm * (f(p * q) - up * uq)
            s = ((2 * up * uq + c1) * (2 * vpq + c2)) / (
                (up ** 2 + uq ** 2 + c1) * (vp + vq + c2))
            vals.append(s[3:-3, 3:-3].mean())  # crop the 7//2 edge
        return np.mean(vals)

    got = np.asarray(dssim_distance(jnp.asarray(x), jnp.asarray(y)))
    want = np.array([(1 - ssim_ref(x[i], y[i])) / 2 for i in range(len(x))])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)
    assert np.allclose(
        np.asarray(dssim_distance(jnp.asarray(x), jnp.asarray(x))), 0, atol=1e-6)


def test_wilson_interval():
    """Certification CI for the ACC sweeps: Wilson score interval on the
    bit-error rate. Pinned against the closed form at its edge cases."""
    from ideas_tpu.eval.metrics import wilson_interval

    # 0 flips in n bits: lower bound 0, upper = z^2 / (n + z^2).
    lo, hi = wilson_interval(0, 40960)
    assert lo == 0.0
    np.testing.assert_allclose(hi, 1.96 ** 2 / (40960 + 1.96 ** 2), rtol=1e-12)

    # Symmetric at p = 0.5.
    lo, hi = wilson_interval(500, 1000)
    np.testing.assert_allclose(0.5 - lo, hi - 0.5, rtol=1e-9)
    # Wilson half-width at p=.5, n=1000: z/(1+z^2/n) * sqrt(.25/n + z^2/4n^2)
    z = 1.96
    half = (z / (1 + z * z / 1000)) * (0.25 / 1000 + z * z / 4e6) ** 0.5
    np.testing.assert_allclose(hi - 0.5, half, rtol=1e-9)

    # Degenerate input.
    assert wilson_interval(0, 0) == (0.0, 1.0)


def test_lab_fallback_metrics_and_psnr():
    """Lab-colorspace FakeNet metrics + PSNR helper
    (`lpips/networks_basic.py:158-176`, `lpips/__init__.py:46-82`):
    rgb2lab pinned against a float64 numpy oracle of skimage's
    formulas; l2_lab/dssim_lab route through the reference's exact
    uint8-quantize-then-Lab conversion."""
    from scipy.ndimage import uniform_filter

    from ideas_tpu.eval.lpips import dssim_lab, l2_lab, psnr, rgb2lab

    rng = np.random.default_rng(5)
    x = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.2, x.shape), -1, 1).astype(np.float32)

    def rgb2lab_ref(rgb):  # float64 oracle, skimage color.rgb2lab math
        rgb = rgb.astype(np.float64)
        lin = np.where(rgb > 0.04045,
                       ((rgb + 0.055) / 1.055) ** 2.4, rgb / 12.92)
        m = np.array([[0.412453, 0.357580, 0.180423],
                      [0.212671, 0.715160, 0.072169],
                      [0.019334, 0.119193, 0.950227]])
        t = lin @ m.T / np.array([0.95047, 1.0, 1.08883])
        f = np.where(t > (6 / 29) ** 3,
                     np.cbrt(t), t / (3 * (6 / 29) ** 2) + 4 / 29)
        return np.stack([116 * f[..., 1] - 16,
                         500 * (f[..., 0] - f[..., 1]),
                         200 * (f[..., 1] - f[..., 2])], axis=-1)

    rgb01 = ((x[0] + 1) * 0.5).astype(np.float32)
    np.testing.assert_allclose(np.asarray(rgb2lab(jnp.asarray(rgb01))),
                               rgb2lab_ref(rgb01), rtol=1e-4, atol=2e-3)

    def to_lab(a):  # tensor2im truncation then Lab, per the reference
        q = np.clip(np.floor((a + 1.0) * 127.5), 0, 255)
        return rgb2lab_ref(q / 255.0)

    got_l2 = np.asarray(l2_lab(jnp.asarray(x), jnp.asarray(y)))
    want_l2 = np.array([
        0.5 * (((to_lab(x[i]) - to_lab(y[i])) / 100.0) ** 2).mean()
        for i in range(len(x))])
    np.testing.assert_allclose(got_l2, want_l2, rtol=1e-3, atol=1e-7)

    def ssim_lab_ref(a, b):
        p3, q3 = to_lab(a), to_lab(b)
        c1, c2 = (0.01 * 100) ** 2, (0.03 * 100) ** 2
        vals = []
        for ch in range(3):
            p, q = p3[..., ch], q3[..., ch]
            f = lambda m: uniform_filter(m, size=7)
            up, uq = f(p), f(q)
            cov_norm = 49.0 / 48.0
            vp = cov_norm * (f(p * p) - up * up)
            vq = cov_norm * (f(q * q) - uq * uq)
            vpq = cov_norm * (f(p * q) - up * uq)
            s = ((2 * up * uq + c1) * (2 * vpq + c2)) / (
                (up ** 2 + uq ** 2 + c1) * (vp + vq + c2))
            vals.append(s[3:-3, 3:-3].mean())
        return np.mean(vals)

    got_ds = np.asarray(dssim_lab(jnp.asarray(x), jnp.asarray(y)))
    want_ds = np.array([(1 - ssim_lab_ref(x[i], y[i])) / 2
                        for i in range(len(x))])
    np.testing.assert_allclose(got_ds, want_ds, rtol=1e-3, atol=1e-5)
    assert np.allclose(
        np.asarray(dssim_lab(jnp.asarray(x), jnp.asarray(x))), 0, atol=1e-6)

    got_psnr = np.asarray(psnr(jnp.asarray(x), jnp.asarray(y)))
    mse = ((x - y) * 127.5) ** 2
    want_psnr = 10 * np.log10(255.0 ** 2 / mse.mean(axis=(1, 2, 3)))
    np.testing.assert_allclose(got_psnr, want_psnr, rtol=1e-4)


def test_ppl_slerp_endpoints():
    from ideas_tpu.eval.ppl import slerp

    a = jnp.asarray([[1.0, 0.0]])
    b = jnp.asarray([[0.0, 1.0]])
    np.testing.assert_allclose(np.asarray(slerp(a, b, 0.0)), np.asarray(a),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(slerp(a, b, 1.0)), np.asarray(b),
                               atol=1e-5)
