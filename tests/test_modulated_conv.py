"""ModulatedConv2d equivalence: the TPU-native scale-input /
demodulate-output formulation must match the reference's grouped-conv
with per-sample demodulated weights (`stylegan2/model.py:236-277`) —
SURVEY.md 'hard part (a)'. The oracle below implements the reference
algorithm directly (per-sample weight demodulation + per-sample conv),
independent of the production code path."""

import math

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import pytest

from ideas_tpu.nn.layers import ModulatedConv2d


def oracle_modulated_conv(x, w_hwio, style_s, demodulate, upsample,
                          downsample, blur_kernel=(1, 3, 3, 1)):
    """Reference semantics, computed per sample with explicit weights.

    x: (B, H, W, in); w_hwio: (k, k, in, out); style_s: (B, in) —
    the *post-modulation-linear* style (weight scale applied inside).
    """
    from ideas_tpu.ops.upfirdn2d import blur

    b = x.shape[0]
    k = w_hwio.shape[0]
    in_ch = w_hwio.shape[2]
    out_ch = w_hwio.shape[3]
    scale = 1.0 / math.sqrt(in_ch * k * k)

    outs = []
    for i in range(b):
        w_i = scale * w_hwio * style_s[i][None, None, :, None]  # modulate
        if demodulate:
            demod = 1.0 / np.sqrt(
                np.sum(np.asarray(w_i) ** 2, axis=(0, 1, 2)) + 1e-8
            )
            w_i = w_i * demod[None, None, None, :]
        xi = x[i : i + 1]
        if upsample:
            wf = jnp.flip(jnp.asarray(w_i), (0, 1))
            y = lax.conv_general_dilated(
                xi, wf, (1, 1), ((k - 1, k - 1), (k - 1, k - 1)),
                lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            p = (len(blur_kernel) - 2) - (k - 1)
            y = blur(y, blur_kernel,
                     pad=((p + 1) // 2 + 1, p // 2 + 1), upsample_factor=2)
        elif downsample:
            p = (len(blur_kernel) - 2) + (k - 1)
            xi = blur(xi, blur_kernel, pad=((p + 1) // 2, p // 2))
            y = lax.conv_general_dilated(
                xi, jnp.asarray(w_i), (2, 2), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
            y = lax.conv_general_dilated(
                xi, jnp.asarray(w_i), (1, 1),
                ((k // 2, k // 2), (k // 2, k // 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        outs.append(y)
    return jnp.concatenate(outs, axis=0)


@pytest.mark.parametrize("mode", ["plain", "up", "down"])
@pytest.mark.parametrize("demod", [True, False])
def test_modulated_conv_matches_reference_algorithm(mode, demod):
    rng = np.random.default_rng(0)
    b, h, in_ch, out_ch, style_dim = 3, 8, 16, 24, 12
    x = jnp.asarray(rng.standard_normal((b, h, h, in_ch)).astype(np.float32))
    style = jnp.asarray(rng.standard_normal((b, style_dim)).astype(np.float32))

    m = ModulatedConv2d(
        out_ch, 3, demodulate=demod,
        upsample=mode == "up", downsample=mode == "down",
    )
    params = m.init(jax.random.PRNGKey(1), x, style)
    got = m.apply(params, x, style)

    # Recompute the style modulation exactly as the module does.
    p = params["params"]
    mod_w = np.asarray(p["modulation"]["weight"])  # (style_dim, in)
    mod_b = np.asarray(p["modulation"]["bias"])
    s = np.asarray(style) @ (mod_w / math.sqrt(style_dim)) + mod_b

    want = oracle_modulated_conv(
        x, jnp.asarray(p["weight"]), jnp.asarray(s), demod,
        upsample=mode == "up", downsample=mode == "down",
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_modulated_conv_bf16_close_to_fp32():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
    style = jnp.asarray(rng.standard_normal((2, 12)).astype(np.float32))
    m32 = ModulatedConv2d(24, 3)
    m16 = ModulatedConv2d(24, 3, dtype=jnp.bfloat16)
    params = m32.init(jax.random.PRNGKey(0), x, style)
    y32 = np.asarray(m32.apply(params, x, style))
    y16 = np.asarray(m16.apply(params, x, style)).astype(np.float32)
    # bf16 has ~3 decimal digits; demod stays fp32 so error is bounded
    assert np.max(np.abs(y32 - y16)) / (np.abs(y32).max() + 1e-6) < 0.05
