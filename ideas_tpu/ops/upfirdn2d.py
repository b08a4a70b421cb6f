"""upfirdn2d: fused upsample -> FIR filter -> downsample, NHWC, TPU-native.

Semantics match the reference CUDA op (`/root/reference/stylegan2/op/
upfirdn2d_kernel.cu` + the pure-PyTorch oracle `upfirdn2d.py:159-200`):

    1. zero-stuff upsample by `up` (each input sample is followed by
       ``up - 1`` zeros, so a length-H input becomes length ``H*up``),
    2. pad with ``(pad0, pad1)`` zeros per spatial axis (negative pads crop),
    3. *convolve* (not correlate) with a 2-D FIR kernel,
    4. keep every ``down``-th sample.

Output size per axis: ``(in*up + pad0 + pad1 - kh) // down + 1``.

TPU-first design: instead of a hand-scheduled shared-memory tile kernel
(the reference specializes 6 (up, down, k) modes, `upfirdn2d_kernel.cu:
250-365`), the whole pipeline is a single `lax.conv_general_dilated` with
`lhs_dilation=up`, `window_strides=down` and explicit (possibly negative)
padding — XLA lowers this to one fused depthwise convolution, and its
transpose rule automatically reproduces the reference's analytic gradient
(swapped up/down + flipped kernel, `upfirdn2d.py:111-116`). Separable
kernels (every blur in StyleGAN2 uses the outer product of a 1-D kernel,
`stylegan2/model.py:22-30`) take a two-pass rank-1 path which halves the
FIR arithmetic.

All functions take NHWC (TPU-native layout); the reference is NCHW.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def make_kernel(k, gain: float = 1.0) -> jnp.ndarray:
    """Build a normalized 2-D FIR kernel from a 1-D or 2-D tap list.

    Mirrors `stylegan2/model.py:22-30`: 1-D inputs become their outer
    product; the kernel is normalized to unit sum, then scaled by `gain`
    (the reference multiplies by ``factor**2`` for upsampling paths).
    """
    k = jnp.asarray(k, dtype=jnp.float32)
    if k.ndim == 1:
        k = k[None, :] * k[:, None]
    k = k / jnp.sum(k)
    return k * gain


def _as_pair(v) -> tuple[int, int]:
    if isinstance(v, (tuple, list)):
        a, b = v
        return int(a), int(b)
    return int(v), int(v)


def upfirdn2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    up=1,
    down=1,
    pad=(0, 0),
) -> jnp.ndarray:
    """Apply upsample->FIR->downsample to an NHWC tensor.

    Args:
        x: (N, H, W, C) input.
        kernel: 2-D FIR kernel (kh, kw), or 1-D (k,) interpreted as a
            separable kernel whose 2-D form is ``k[:,None]*k[None,:]``
            **without** renormalization (callers pass pre-normalized taps).
        up / down: int or (y, x) pair of resampling factors.
        pad: (pad0, pad1) applied to both spatial axes, or a 4-tuple
            (pad_x0, pad_x1, pad_y0, pad_y1) following the reference's
            argument order (`stylegan2/op/upfirdn2d.py:145-156`).

    Returns:
        (N, H', W', C) with H' = (H*up_y + pad_y0 + pad_y1 - kh)//down_y + 1.
    """
    up_y, up_x = _as_pair(up)
    down_y, down_x = _as_pair(down)
    if len(pad) == 2:
        pad_x0, pad_x1 = int(pad[0]), int(pad[1])
        pad_y0, pad_y1 = pad_x0, pad_x1
    else:
        pad_x0, pad_x1, pad_y0, pad_y1 = (int(p) for p in pad)

    kernel = jnp.asarray(kernel)
    if kernel.ndim == 1:
        # Separable rank-1 kernel: two 1-D passes (y then x).
        ky = kernel
        x = _upfirdn1d(x, ky, up_y, down_y, pad_y0, pad_y1, axis=1)
        x = _upfirdn1d(x, ky, up_x, down_x, pad_x0, pad_x1, axis=2)
        return x
    return _upfirdn2d_full(
        x, kernel, up_y, up_x, down_y, down_x, pad_y0, pad_y1, pad_x0, pad_x1
    )


def _depthwise_conv(x, k_hw11, strides, padding, lhs_dilation):
    """Apply ONE FIR kernel to every channel of an NHWC tensor.

    k_hw11: (kh, kw, 1, 1) HWIO kernel (the same taps for all channels —
    every FIR resample in the model family works this way).

    TPU (and other accelerators): a single depthwise
    `conv_general_dilated` with feature_group_count=C — XLA fuses the
    zero-stuffing/pad/decimate pipeline into one op and the layout stays
    NHWC end to end.

    CPU (the test suite's 8 virtual devices and the driver's multi-chip
    dry-run gate): XLA:CPU lowers grouped convolutions outside its fast
    Eigen path — measured 7.5x slower forward / 4x slower gradient than
    the equivalent group=1 conv at (64, 64, C=64). Fold the channels
    into the batch dimension and run a single-channel conv instead;
    results are bit-identical (same taps per channel), and the transpose
    (gradient) rule inherits the fast path too.
    """
    c = x.shape[-1]
    if jax.default_backend() == "cpu":
        n, h, w, _ = x.shape
        y = jnp.moveaxis(x, 3, 1).reshape(n * c, h, w, 1)
        y = lax.conv_general_dilated(
            y,
            k_hw11,
            window_strides=strides,
            padding=padding,
            lhs_dilation=lhs_dilation,
            rhs_dilation=(1, 1),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.moveaxis(y.reshape(n, c, y.shape[1], y.shape[2]), 1, 3)
    return lax.conv_general_dilated(
        x,
        jnp.tile(k_hw11, (1, 1, 1, c)),
        window_strides=strides,
        padding=padding,
        lhs_dilation=lhs_dilation,
        rhs_dilation=(1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def _upfirdn2d_full(x, kernel, up_y, up_x, down_y, down_x,
                    pad_y0, pad_y1, pad_x0, pad_x1):
    # Convolution == correlation with the flipped kernel.
    k = jnp.flip(kernel, (0, 1)).astype(x.dtype)[:, :, None, None]
    # lhs_dilation inserts (up-1) zeros *between* samples only; the
    # reference's zero-stuffing also appends (up-1) trailing zeros
    # (`upfirdn2d.py:168-170`), which we fold into the right/bottom pad.
    pads = (
        (pad_y0, pad_y1 + up_y - 1),
        (pad_x0, pad_x1 + up_x - 1),
    )
    return _depthwise_conv(
        x,
        k,
        strides=(down_y, down_x),
        padding=pads,
        lhs_dilation=(up_y, up_x),
    )


def _upfirdn1d(x, taps, up, down, pad0, pad1, axis):
    """1-D upfirdn along a spatial axis of an NHWC tensor."""
    k = jnp.flip(taps, 0).astype(x.dtype)
    if axis == 1:
        kk = k[:, None, None, None]
        pads = ((pad0, pad1 + up - 1), (0, 0))
        strides = (down, 1)
        dil = (up, 1)
    elif axis == 2:
        kk = k[None, :, None, None]
        pads = ((0, 0), (pad0, pad1 + up - 1))
        strides = (1, down)
        dil = (1, up)
    else:
        raise ValueError(axis)
    return _depthwise_conv(x, kk, strides=strides, padding=pads, lhs_dilation=dil)


def upfirdn1d(x, taps, up=1, down=1, pad=(0, 0), axis=1):
    """Single-axis upfirdn on an NHWC tensor (axis 1 = H, axis 2 = W)."""
    t = jnp.asarray(taps).astype(x.dtype)
    return _upfirdn1d(x, t, up, down, pad[0], pad[1], axis=axis)


# ---------------------------------------------------------------------------
# Convenience wrappers mirroring stylegan2/model.py Blur/Upsample/Downsample.
# ---------------------------------------------------------------------------


def blur(x, kernel_taps=(1, 3, 3, 1), pad=(0, 0), upsample_factor: int = 1):
    """FIR blur (`stylegan2/model.py:75-91`). kernel_taps is the 1-D tap list."""
    taps = np.asarray(kernel_taps, dtype=np.float64)
    # Separable path: per-axis taps scaled so outer(ty, tx) == the
    # normalized 2-D kernel times upsample_factor**2.
    ty = taps / taps.sum()
    tx = ty * (upsample_factor ** 2) if upsample_factor > 1 else ty
    x = _upfirdn1d(x, jnp.asarray(ty, jnp.float32).astype(x.dtype), 1, 1, pad[0], pad[1], axis=1)
    x = _upfirdn1d(x, jnp.asarray(tx, jnp.float32).astype(x.dtype), 1, 1, pad[0], pad[1], axis=2)
    return x


def upsample2x(x, kernel_taps=(1, 3, 3, 1)):
    """2x FIR upsampling (`stylegan2/model.py:33-51`)."""
    taps = np.asarray(kernel_taps, dtype=np.float64)
    factor = 2
    p = len(taps) - factor
    pad0 = (p + 1) // 2 + factor - 1
    pad1 = p // 2
    ty = taps / taps.sum() * factor  # sqrt of factor**2 gain per axis
    t = jnp.asarray(ty, jnp.float32).astype(x.dtype)
    x = _upfirdn1d(x, t, factor, 1, pad0, pad1, axis=1)
    x = _upfirdn1d(x, t, factor, 1, pad0, pad1, axis=2)
    return x


def downsample2x(x, kernel_taps=(1, 3, 3, 1)):
    """2x FIR downsampling (`stylegan2/model.py:54-72`)."""
    taps = np.asarray(kernel_taps, dtype=np.float64)
    factor = 2
    p = len(taps) - factor
    pad0 = (p + 1) // 2
    pad1 = p // 2
    ty = taps / taps.sum()
    t = jnp.asarray(ty, jnp.float32).astype(x.dtype)
    x = _upfirdn1d(x, t, 1, factor, pad0, pad1, axis=1)
    x = _upfirdn1d(x, t, 1, factor, pad0, pad1, axis=2)
    return x
