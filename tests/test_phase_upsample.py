"""Fused phase-decomposed upsample conv == conv_transpose + blur.

Pins `ideas_tpu/ops/phase_upsample.py` (the TPU rewrite of the
reference's conv_transpose2d + Blur up path, `stylegan2/model.py:250-261`
and `models.py:75-95`) against the two-stage formulation, forward and
through the R1-style double gradient, at layer level via the module
toggle so the exact production code paths are compared.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ideas_tpu.nn.layers import ConvLayer, ModulatedConv2d, StyledResBlock, _conv_transpose
from ideas_tpu.ops import phase_upsample
from ideas_tpu.ops.upfirdn2d import blur


@pytest.fixture
def toggle():
    orig = phase_upsample.enabled()
    yield
    phase_upsample.set_enabled(orig)


def _both(module_fn, args):
    phase_upsample.set_enabled(False)
    m = module_fn()
    params = m.init(jax.random.PRNGKey(0), *args)
    ref = m.apply(params, *args)
    phase_upsample.set_enabled(True)
    got = module_fn().apply(params, *args)
    return params, ref, got


def test_raw_op_matches_two_stage(toggle):
    rng = np.random.default_rng(0)
    for k, gain in [(3, 4.0), (1, 1.0)]:
        x = jnp.asarray(rng.normal(size=(2, 12, 12, 5)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(k, k, 5, 3)), jnp.float32)
        p = (4 - 2) - (k - 1)
        pad = ((p + 1) // 2 + 1, p // 2 + 1)
        assert phase_upsample.fusable(k, (1, 3, 3, 1), pad)
        ref = blur(_conv_transpose(x, w, stride=2), (1, 3, 3, 1), pad=pad,
                   upsample_factor=2 if gain == 4.0 else 1)
        got = phase_upsample.fused_upsample_conv(x, w, (1, 3, 3, 1), pad, gain=gain)
        assert got.shape == (2, 24, 24, 3) == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_modulated_conv_up_fused_matches(toggle):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)), jnp.float32)
    s = jnp.asarray(rng.normal(size=(2, 32)), jnp.float32)
    _, ref, got = _both(
        lambda: ModulatedConv2d(12, 3, upsample=True), (x, s)
    )
    assert got.shape == (2, 32, 32, 12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_conv_layer_up_skip_fused_matches(toggle):
    # The StyledResBlock skip: 1x1 upsample ConvLayer, bias-free, gain-1 blur.
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)), jnp.float32)
    _, ref, got = _both(
        lambda: ConvLayer(6, 1, upsample=True, use_bias=False, activate=False),
        (x,),
    )
    assert got.shape == (2, 32, 32, 6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_styled_res_block_double_grad_matches(toggle):
    # R1-style grad-of-grad through the full upsampling res block.
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8)), jnp.float32)
    s = jnp.asarray(rng.normal(size=(2, 16)), jnp.float32)

    def make():
        return StyledResBlock(8, upsample=True)

    phase_upsample.set_enabled(False)
    m = make()
    params = m.init(jax.random.PRNGKey(0), x, s)

    def r1(enabled):
        phase_upsample.set_enabled(enabled)

        def inner(xi):
            return jnp.sum(make().apply(params, xi, s) ** 2)

        def outer(xi):
            return jnp.sum(jax.grad(inner)(xi) ** 2)

        return jax.grad(outer)(x)

    a, b = r1(False), r1(True)
    scale = np.abs(np.asarray(a)).max() + 1e-8
    assert np.abs(np.asarray(a) - np.asarray(b)).max() / scale < 1e-4
