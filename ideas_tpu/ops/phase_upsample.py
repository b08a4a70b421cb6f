"""Phase-decomposed fused upsample-conv for the StyleGAN2 up path.

The reference's upsampling modulated conv is ``conv_transpose2d(stride=2)``
followed by a depthwise FIR ``Blur`` (`stylegan2/model.py:250-261`; same
shape arithmetic in `models.py:95-112` for the plain ConvLayer). On GPU
that is two kernels; as written for XLA it is an ``lhs_dilation=2`` conv —
whose MACs are 3/4 structural zeros unless the compiler dephases it — plus
a depthwise conv with an extra HBM round trip.

TPU-native rewrite (exact, not approximate): both stages are linear and
translation-equivariant, so their composition is a single stride-2
transposed conv with the composed kernel

    V = convolve_full(w, outer(blur_y, blur_x)) ,   shape (k+nb-1)^2

and the four output phases ``out[2u+ry, 2v+rx]`` of that transposed conv
are each an ordinary *dense stride-1 correlation* of the input with a
small static slice of ``V``:

    out[2u+ry, 2v+rx] = sum_d  V[r - 2d + nb-1 - pad0]  x[u + d]

(per axis; ``d`` ranges over a tiny static window). We stack the four
phase kernels along the output-channel axis, run ONE dense conv
``(B,H,W,I) -> (B,H,W,4*O)`` — the MXU's best case — and pixel-shuffle to
``(B,2H,2W,O)``. The separate blur pass disappears entirely, and the
bias + leaky-ReLU epilogue fuses into the conv output like any other
elementwise op.

Validity: the fusion produces exactly the reference output when the
StyleGAN2 shape arithmetic closes, i.e. ``k + pad0 + pad1 - nb - 1 == 0``
(true for the k=3 styled convs and the k=1 skips with the standard
(1,3,3,1) blur). `fusable()` checks this; callers fall back to the
two-stage path otherwise.

Gradients need no custom rules: the op is built from ``lax.conv`` +
reshapes, so JAX autodiff (including the R1 double-grad) is exact.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

# Global default: layers consult this to pick the fused path. Kept as a
# plain module flag (not a module arg) so models need no config plumbing
# and checkpoints/param trees are unchanged either way.
#
# DEFAULT OFF after measurement (PERF.md): XLA:TPU already dephases
# lhs_dilation transposed convs to the ideal MAC count, so folding the
# blur in (which inflates the kernel from k^2 to (k+nb-1)^2 /4-phase =
# 4x the ideal MACs for k=3, nb=4) trades a cheap depthwise pass for 4x
# MXU work: measured 47.3 ms vs 20.3 ms for the B=24 256^2 generator
# forward. Kept as a verified-exact alternative for hardware/compiler
# combinations where dilated convs lower poorly.
_ENABLED = False


def set_enabled(v: bool) -> None:
    """Select the fused path for traces that happen AFTER this call.

    Must run before any step/apply fn is jit-traced: jax.jit caches by
    function identity and Trainer caches step fns, so a toggle after
    tracing silently keeps the old behavior. We can't see jit's cache
    from here, but we do know whether *this flag* was already consulted
    by a trace — warn loudly in that case instead of failing silently."""
    global _ENABLED
    if _CONSULTED and bool(v) != _ENABLED:
        import warnings

        warnings.warn(
            "phase_upsample.set_enabled() called after the flag was "
            "already consulted by a model trace; already-compiled "
            "(cached) step/apply functions keep the OLD setting. Toggle "
            "before building any jitted function.",
            stacklevel=2,
        )
    _ENABLED = bool(v)


def enabled() -> bool:
    global _CONSULTED
    _CONSULTED = True
    return _ENABLED


_CONSULTED = False


def fusable(kernel_size: int, blur_taps, pad) -> bool:
    """True iff blur(conv_transpose(x)) composes to an exact 2x phase conv."""
    nb = len(blur_taps)
    p0, p1 = int(pad[0]), int(pad[1])
    return kernel_size + p0 + p1 - nb - 1 == 0


def _phase_windows(k: int, nb: int, p0: int):
    """Common static tap-offset window [d_lo, d_hi] covering both phases."""
    d_lo, d_hi = None, None
    for r in (0, 1):
        # valid d satisfy 0 <= r - 2d + nb-1-p0 <= k+nb-2
        lo = -(-(r - p0 - k + 1) // 2)  # ceil
        hi = (r + nb - 1 - p0) // 2  # floor
        d_lo = lo if d_lo is None else min(d_lo, lo)
        d_hi = hi if d_hi is None else max(d_hi, hi)
    return d_lo, d_hi


def fused_upsample_conv(
    x: jnp.ndarray,
    w: jnp.ndarray,
    blur_taps=(1, 3, 3, 1),
    pad=(1, 1),
    gain: float = 4.0,
) -> jnp.ndarray:
    """blur(conv_transpose2d(x, w, stride=2), taps, pad, gain) as ONE conv.

    Args:
        x: (B, H, W, I) NHWC input.
        w: (k, k, I, O) HWIO kernel, *already* equalized-lr scaled; fp32
           (the composed kernel is built in fp32, then cast to x.dtype).
        blur_taps: 1-D FIR tap list (normalized internally).
        pad: (pad0, pad1) blur padding per the StyleGAN2 up arithmetic.
        gain: total 2-D FIR gain (reference uses factor**2 = 4).

    Returns:
        (B, 2H, 2W, O), numerically equal to the two-stage path.
    """
    k = int(w.shape[0])
    nb = len(blur_taps)
    p0, p1 = int(pad[0]), int(pad[1])
    if not fusable(k, blur_taps, pad):
        raise ValueError(
            f"not fusable: k={k} pad=({p0},{p1}) nb={nb} "
            f"(need k+pad0+pad1-nb-1 == 0)"
        )
    out_ch = w.shape[-1]

    taps = np.asarray(blur_taps, dtype=np.float64)
    taps = taps / taps.sum()
    b2 = np.outer(taps, taps) * float(gain)  # (nb, nb) fp64 host constants

    # V = full 2-D convolution of w with b2: V[n] = sum_a b2[a] * w[n-a].
    wf = w.astype(jnp.float32)
    vk = k + nb - 1
    wp = jnp.pad(wf, ((nb - 1, nb - 1), (nb - 1, nb - 1), (0, 0), (0, 0)))
    v = jnp.zeros((vk, vk) + wf.shape[2:], jnp.float32)
    for ay in range(nb):
        for ax in range(nb):
            sy, sx = nb - 1 - ay, nb - 1 - ax
            v = v + b2[ay, ax] * lax.slice(
                wp, (sy, sx, 0, 0), (sy + vk, sx + vk) + wp.shape[2:]
            )

    # Static phase kernels K[ry,rx][dy,dx] = V[r - 2d + nb-1-p0] (0 outside).
    d_lo, d_hi = _phase_windows(k, nb, p0)
    t = d_hi - d_lo + 1
    zeros = jnp.zeros(wf.shape[2:], jnp.float32)

    def tap(r, d):
        n = r - 2 * d + nb - 1 - p0
        if 0 <= n < vk:
            return n
        return None

    phase_kernels = []
    for ry in (0, 1):
        for rx in (0, 1):
            rows = []
            for dy in range(d_lo, d_hi + 1):
                cols = []
                ny = tap(ry, dy)
                for dx in range(d_lo, d_hi + 1):
                    nx = tap(rx, dx)
                    if ny is None or nx is None:
                        cols.append(zeros)
                    else:
                        cols.append(v[ny, nx])
                rows.append(jnp.stack(cols, axis=0))
            phase_kernels.append(jnp.stack(rows, axis=0))  # (t, t, I, O)
    # (t, t, I, 4*O): phases stacked along output channels.
    wbig = jnp.concatenate(phase_kernels, axis=-1).astype(x.dtype)

    y = lax.conv_general_dilated(
        x,
        wbig,
        window_strides=(1, 1),
        padding=((-d_lo, d_hi), (-d_lo, d_hi)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, H, W, 4*O)

    bsz, h, wdt = y.shape[0], y.shape[1], y.shape[2]
    y = y.reshape(bsz, h, wdt, 2, 2, out_ch)
    y = y.transpose(0, 1, 3, 2, 4, 5)  # (B, H, ry, W, rx, O)
    return y.reshape(bsz, 2 * h, 2 * wdt, out_ch)
