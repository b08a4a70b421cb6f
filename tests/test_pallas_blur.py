"""Fused Pallas blur vs the XLA upfirdn path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ideas_tpu.ops.pallas_blur import blur2d_pallas
from ideas_tpu.ops.upfirdn2d import upfirdn2d


TAPS = tuple(t / 8.0 for t in (1.0, 3.0, 3.0, 1.0))


@pytest.mark.parametrize("pad", [(2, 1), (1, 1), (2, 2)])
@pytest.mark.parametrize("shape", [(2, 16, 16, 8), (1, 9, 13, 3), (2, 32, 16, 128)])
def test_matches_xla_blur(pad, shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    got = blur2d_pallas(x, TAPS, TAPS, pad)
    want = upfirdn2d(x, jnp.asarray(TAPS), up=1, down=1, pad=pad)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gradient_matches_xla():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 12, 12, 8)).astype(np.float32))
    pad = (2, 1)

    f_pal = lambda x: jnp.sum(blur2d_pallas(x, TAPS, TAPS, pad) ** 2)
    f_xla = lambda x: jnp.sum(
        upfirdn2d(x, jnp.asarray(TAPS), up=1, down=1, pad=pad) ** 2
    )
    g_pal = jax.grad(f_pal)(x)
    g_xla = jax.grad(f_xla)(x)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_xla),
                               rtol=1e-4, atol=1e-5)


def test_double_gradient_finite():
    # R1 needs grad-of-grad through the blur.
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, 8, 8, 4)).astype(np.float32)
    )

    def penalty(x):
        g = jax.grad(
            lambda x: jnp.sum(blur2d_pallas(x * x, TAPS, TAPS, (2, 1)))
        )(x)
        return jnp.sum(g ** 2)

    gg = jax.grad(penalty)(x)
    assert np.isfinite(np.asarray(gg)).all()


def test_epilogue_matches_xla_composition():
    """blur2d_bias_act_pallas == blur -> *scale -> +bias -> lrelu*sqrt(2)."""
    from ideas_tpu.ops.pallas_blur import blur2d_bias_act_pallas

    rng = np.random.default_rng(2)
    shape = (2, 16, 16, 8)
    pad = (2, 1)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal((2, 8)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))
    got = blur2d_bias_act_pallas(x, scale, bias, TAPS, TAPS, pad)
    y = upfirdn2d(x, jnp.asarray(TAPS), up=1, down=1, pad=pad)
    y = y * scale[:, None, None, :] + bias
    want = jnp.where(y >= 0, y, 0.2 * y) * np.sqrt(2.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
