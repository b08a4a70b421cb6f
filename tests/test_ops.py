"""Unit tests for ideas_tpu.ops against independent numpy oracles.

The oracle implements the documented upfirdn2d semantics directly
(zero-stuff -> pad/crop -> 2-D convolution -> subsample), mirroring the
role of the reference's `upfirdn2d_native` CPU fallback as the source of
truth for the fast path (SURVEY.md section 4, mechanism 1).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ideas_tpu.ops import (
    upfirdn2d,
    blur,
    upsample2x,
    downsample2x,
    fused_leaky_relu,
)
from ideas_tpu.ops.fused_act import _fused_leaky_relu_pallas, SCALE, NEGATIVE_SLOPE


def upfirdn2d_oracle(x, k, up, down, pad0, pad1):
    """Direct numpy implementation of the documented semantics. NHWC."""
    n, h, w, c = x.shape
    kh, kw = k.shape
    # 1. zero-stuff upsample (trailing zeros included).
    up_h, up_w = h * up, w * up
    xs = np.zeros((n, up_h, up_w, c), x.dtype)
    xs[:, ::up, ::up, :] = x
    # 2. pad (negative = crop).
    def padcrop(a, axis, p0, p1):
        pads = [(0, 0)] * 4
        pads[axis] = (max(p0, 0), max(p1, 0))
        a = np.pad(a, pads)
        sl = [slice(None)] * 4
        sl[axis] = slice(max(-p0, 0), a.shape[axis] - max(-p1, 0))
        return a[tuple(sl)]

    xs = padcrop(xs, 1, pad0, pad1)
    xs = padcrop(xs, 2, pad0, pad1)
    # 3. true convolution with k (= correlation with flipped k).
    kf = k[::-1, ::-1]
    oh = xs.shape[1] - kh + 1
    ow = xs.shape[2] - kw + 1
    out = np.zeros((n, oh, ow, c), np.float64)
    for i in range(kh):
        for j in range(kw):
            out += kf[i, j] * xs[:, i : i + oh, j : j + ow, :]
    # 4. subsample.
    return out[:, ::down, ::down, :].astype(np.float32)


@pytest.mark.parametrize(
    "up,down,pad,ksize",
    [
        (1, 1, (1, 1), 4),
        (1, 1, (2, 1), 4),
        (2, 1, (2, 1), 4),
        (1, 2, (2, 1), 4),
        (2, 2, (1, 1), 3),
        (1, 1, (0, 0), 1),
        (1, 1, (-1, 2), 4),  # negative pad = crop
        (4, 1, (3, 2), 6),
        (1, 4, (3, 2), 6),
    ],
)
def test_upfirdn2d_matches_oracle(up, down, pad, ksize):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 12, 10, 3)).astype(np.float32)
    k1d = rng.standard_normal(ksize).astype(np.float32) + 2.0
    k2d = np.outer(k1d, k1d)
    k2d = (k2d / k2d.sum()).astype(np.float32)

    want = upfirdn2d_oracle(x, k2d, up, down, pad[0], pad[1])

    got_2d = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k2d), up, down, pad))
    np.testing.assert_allclose(got_2d, want, rtol=1e-5, atol=1e-5)

    # Separable 1-D path must agree with the oracle on the outer-product kernel.
    taps = (k1d / k1d.sum()).astype(np.float32)
    want_sep = upfirdn2d_oracle(x, np.outer(taps, taps), up, down, pad[0], pad[1])
    got_1d = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(taps), up, down, pad))
    np.testing.assert_allclose(got_1d, want_sep, rtol=1e-5, atol=1e-5)


def test_blur_up_down_shapes_and_gain():
    x = jnp.ones((1, 16, 16, 4))
    up = upsample2x(x)
    assert up.shape == (1, 32, 32, 4)
    # Unit-DC input stays ~1 under normalized upsampling (interior pixels).
    np.testing.assert_allclose(np.asarray(up)[0, 8:24, 8:24, 0], 1.0, atol=1e-5)
    down = downsample2x(x)
    assert down.shape == (1, 8, 8, 4)
    np.testing.assert_allclose(np.asarray(down)[0, 2:6, 2:6, 0], 1.0, atol=1e-5)
    # Blur pad arithmetic from ConvLayer's downsample branch, k=3:
    # p = (4-2) + (3-1) = 4, pad0=2, pad1=2 -> H+1 sized intermediate.
    b = blur(x, (1, 3, 3, 1), pad=(2, 2))
    assert b.shape == (1, 17, 17, 4)


def test_upsample_downsample_gradients_flow():
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 8, 8, 2)), jnp.float32)

    def f(x):
        return jnp.sum(upsample2x(x) ** 2) + jnp.sum(downsample2x(x) ** 2)

    g = jax.grad(f)(x)
    assert g.shape == x.shape
    assert np.isfinite(np.asarray(g)).all()


def test_fused_leaky_relu_semantics():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 5, 5, 8)).astype(np.float32)
    b = rng.standard_normal(8).astype(np.float32)
    got = np.asarray(fused_leaky_relu(jnp.asarray(x), jnp.asarray(b)))
    z = x + b.reshape(1, 1, 1, 8)
    want = np.where(z >= 0, z, z * NEGATIVE_SLOPE) * SCALE
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_fused_leaky_relu_pallas_matches_xla():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 128)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(128).astype(np.float32))
    ref = fused_leaky_relu(x, b)
    got = _fused_leaky_relu_pallas(x, b, NEGATIVE_SLOPE, SCALE)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6)

    # Gradient parity (custom_vjp vs autodiff of the XLA version).
    g_ref = jax.grad(lambda x, b: jnp.sum(fused_leaky_relu(x, b) ** 2), argnums=(0, 1))(x, b)
    g_pal = jax.grad(
        lambda x, b: jnp.sum(_fused_leaky_relu_pallas(x, b, NEGATIVE_SLOPE, SCALE) ** 2),
        argnums=(0, 1),
    )(x, b)
    for a, c in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-5, atol=1e-5)


def test_fused_leaky_relu_double_grad():
    # The R1 path needs d/dx of (d/dx D(x)) through activations.
    x = jnp.asarray(np.linspace(-2, 2, 16, dtype=np.float32).reshape(1, 16))
    b = jnp.asarray(np.zeros(16, np.float32))

    def critic(x):
        return jnp.sum(fused_leaky_relu(x * x, b))  # nonlinear in x

    def penalty(x):
        g = jax.grad(critic)(x)
        return jnp.sum(g ** 2)

    gg = jax.grad(penalty)(x)
    assert np.isfinite(np.asarray(gg)).all()
