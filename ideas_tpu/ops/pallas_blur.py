"""Fused separable FIR blur as a Pallas TPU kernel.

The reference's upfirdn2d CUDA kernel fuses pad -> FIR -> resample into
one memory pass with shared-memory tiles (`upfirdn2d_kernel.cu:107-207`).
In this framework every blur on the IDEAS hot path is a *plain* blur
(resampling lives in the adjacent strided/transposed convolution), so the
Pallas equivalent fuses BOTH separable FIR axes into one VMEM pass:
the XLA fallback needs two depthwise-conv HBM round trips, this kernel
needs one read + one write.

Scheme: the input is zero-pre-padded in XLA (fuses with the producer),
then a grid over (batch, H-tiles, C-tiles) DMAs overlapping haloed slabs
HBM -> VMEM, applies the vertical then horizontal taps as shifted
multiply-adds on the VPU, and writes the output tile.

Linear op => custom_vjp is the same kernel with flipped taps and
complementary pads, so R1's double-grad works through it.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _use_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _blur_kernel(x_ref, o_ref, scratch, sem, *, taps_y, taps_x, hb, k):
    """One (n, h-tile, c-tile) program.

    x_ref: HBM (N, H_pad, W_pad, C); o_ref: VMEM out tile (hb, W_out, cb);
    scratch: VMEM (hb + k - 1, W_pad, cb).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = pl.program_id(0)
    hi = pl.program_id(1)
    ci = pl.program_id(2)
    cb = scratch.shape[-1]
    w_out = o_ref.shape[2]

    dma = pltpu.make_async_copy(
        x_ref.at[n, pl.ds(hi * hb, hb + k - 1), :, pl.ds(ci * cb, cb)],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()

    x = scratch[...]
    dt = x.dtype
    # Vertical FIR: (hb, W_pad, cb)
    acc = x[0:hb] * jnp.asarray(taps_y[0], dt)
    for j in range(1, k):
        acc = acc + x[j : j + hb] * jnp.asarray(taps_y[j], dt)
    # Horizontal FIR: (hb, W_out, cb)
    out = acc[:, 0:w_out] * jnp.asarray(taps_x[0], dt)
    for j in range(1, k):
        out = out + acc[:, j : j + w_out] * jnp.asarray(taps_x[j], dt)
    o_ref[0] = out


def _blur_epilogue_kernel(x_ref, bias_ref, o_ref, scratch, sem,
                          *, taps_y, taps_x, hb, k):
    """Blur + bias + scaled leaky relu in one VMEM pass:
    out = leaky_relu(blur(x) + bias[c], 0.2) * sqrt(2).

    The per-(sample, channel) demodulation scale is applied to x in XLA
    BEFORE the kernel — scale commutes with the linear blur and fuses
    into the pre-pad, and keeping it out of the kernel avoids a
    dynamic sublane index that crashes the Mosaic remote compiler."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = pl.program_id(0)
    hi = pl.program_id(1)
    ci = pl.program_id(2)
    cb = scratch.shape[-1]
    w_out = o_ref.shape[2]

    dma = pltpu.make_async_copy(
        x_ref.at[n, pl.ds(hi * hb, hb + k - 1), :, pl.ds(ci * cb, cb)],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()

    x = scratch[...]
    dt = x.dtype
    acc = x[0:hb] * jnp.asarray(taps_y[0], dt)
    for j in range(1, k):
        acc = acc + x[j : j + hb] * jnp.asarray(taps_y[j], dt)
    out = acc[:, 0:w_out] * jnp.asarray(taps_x[0], dt)
    for j in range(1, k):
        out = out + acc[:, j : j + w_out] * jnp.asarray(taps_x[j], dt)
    b = bias_ref[0]   # (cb,)
    y = out + b[None, None, :]
    # leaky relu in max/min form: jnp.where's select lowering crashes the
    # Mosaic remote compile helper on this toolchain (probed 2026-08-17,
    # PERF.md); max/min compiles and is branch-free on the VPU anyway.
    z = jnp.asarray(0.0, dt)
    y = jnp.maximum(y, z) + jnp.minimum(y, z) * jnp.asarray(0.2, dt)
    o_ref[0] = y * jnp.asarray(2.0 ** 0.5, dt)


def _blur_fwd_impl(x, taps_y, taps_x, pad):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, c = x.shape
    k = len(taps_y)
    p0, p1 = pad
    # The kernel correlates; convolution == correlation with flipped taps.
    taps_y = tuple(taps_y[::-1])
    taps_x = tuple(taps_x[::-1])
    h_out = h + p0 + p1 - k + 1
    w_out = w + p0 + p1 - k + 1
    # Zero pre-pad (fuses into the producing op under XLA). W is padded
    # up to a multiple of 8: Mosaic requires 8-aligned slice sizes along
    # the sublane dimension for HBM DMAs; the kernel only reads the first
    # w_out columns of the FIR accumulator, so extra zeros are inert.
    w_pad = w + p0 + p1
    w_align = (-w_pad) % 8
    xp = jnp.pad(x, ((0, 0), (p0, p1), (p0, p1 + w_align), (0, 0)))

    cb = min(c, 128)
    if c % cb:
        cb = c  # small-channel tensors: one channel tile
    # Scratch budget ~1 MiB: (hb + k - 1) * W_pad * cb * itemsize, leaving
    # room for Mosaic's double-buffered output windows in 16 MiB VMEM.
    itemsize = jnp.dtype(x.dtype).itemsize
    budget_rows = (2 ** 20) // max(1, (w_pad + w_align) * cb * itemsize)
    hb = max(8, (budget_rows // 8) * 8)
    hb = min(hb, max(8, h_out), 64)
    # grid must tile h_out exactly; round h_out up via output padding
    n_h = -(-h_out // hb)
    h_pad_needed = n_h * hb + k - 1
    if xp.shape[1] < h_pad_needed:
        xp = jnp.pad(xp, ((0, 0), (0, h_pad_needed - xp.shape[1]), (0, 0), (0, 0)))

    grid = (n, n_h, c // cb)
    out = pl.pallas_call(
        functools.partial(
            _blur_kernel,
            taps_y=tuple(float(t) for t in taps_y),
            taps_x=tuple(float(t) for t in taps_x),
            hb=hb,
            k=k,
        ),
        out_shape=jax.ShapeDtypeStruct((n, n_h * hb, w_out, c), x.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, hb, w_out, cb),
            lambda ni, hi, ci: (ni, hi, 0, ci),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((hb + k - 1, xp.shape[2], cb), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=_use_interpret(),
    )(xp)
    return out[:, :h_out]


def blur2d_bias_act_pallas(x, scale, bias, taps_y: Sequence[float],
                           taps_x: Sequence[float], pad: Tuple[int, int]):
    """Forward-only fused blur + demod-scale + bias + scaled-leaky-relu.

    The measurement candidate from PERF.md ("Pallas fused
    blur+bias+lrelu epilogue"): one VMEM pass for what the XLA path does
    in two depthwise convs plus a fused elementwise pass. Forward only —
    the epilogue is nonlinear, so adopting it on the training path would
    need a custom_vjp; measure before investing (see PERF.md for the
    verdict).

    x: (N, H, W, C); scale: (N, C); bias: (C,)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, c = x.shape
    k = len(taps_y)
    p0, p1 = pad
    taps_y = tuple(float(t) for t in taps_y[::-1])
    taps_x = tuple(float(t) for t in taps_x[::-1])
    h_out = h + p0 + p1 - k + 1
    w_out = w + p0 + p1 - k + 1
    w_pad = w + p0 + p1
    w_align = (-w_pad) % 8
    # demod scale commutes with the linear blur: fold it into the pre-pad
    # (one fused XLA elementwise), keeping the kernel scale-free.
    x = x * scale[:, None, None, :].astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (p0, p1), (p0, p1 + w_align), (0, 0)))

    cb = min(c, 128)
    if c % cb:
        cb = c
    itemsize = jnp.dtype(x.dtype).itemsize
    budget_rows = (2 ** 20) // max(1, (w_pad + w_align) * cb * itemsize)
    hb = max(8, (budget_rows // 8) * 8)
    hb = min(hb, max(8, h_out), 64)
    n_h = -(-h_out // hb)
    h_pad_needed = n_h * hb + k - 1
    if xp.shape[1] < h_pad_needed:
        xp = jnp.pad(xp, ((0, 0), (0, h_pad_needed - xp.shape[1]), (0, 0), (0, 0)))

    grid = (n, n_h, c // cb)
    out = pl.pallas_call(
        functools.partial(
            _blur_epilogue_kernel, taps_y=taps_y, taps_x=taps_x, hb=hb, k=k,
        ),
        out_shape=jax.ShapeDtypeStruct((n, n_h * hb, w_out, c), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            # bias replicated to 8 sublanes: a sublane-1 VMEM block
            # ((1, cb)) passes the Python-side shape check but crashes
            # the Mosaic remote compile helper.
            pl.BlockSpec((8, cb), lambda ni, hi, ci: (0, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, hb, w_out, cb),
            lambda ni, hi, ci: (ni, hi, 0, ci),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((hb + k - 1, xp.shape[2], cb), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=_use_interpret(),
    )(xp, jnp.broadcast_to(bias.astype(x.dtype)[None, :], (8, c)))
    return out[:, :h_out]


def blur2d_pallas(x, taps_y: Tuple[float, ...], taps_x: Tuple[float, ...],
                  pad: Tuple[int, int]):
    """Fused separable blur: conv with outer(taps_y, taps_x), zero pad.

    Wrapped in `linear_call` (the op is linear in x), which gives JAX the
    exact JVP (apply to tangents) and transpose (flipped taps +
    complementary pads) at *every* differentiation order — the R1 penalty
    double-differentiates through discriminator blurs, so custom_vjp's
    first-order-only contract is not enough here.
    """
    taps_y = tuple(float(t) for t in taps_y)
    taps_x = tuple(float(t) for t in taps_x)
    pad = (int(pad[0]), int(pad[1]))
    k = len(taps_y)
    tp = (k - 1 - pad[0], k - 1 - pad[1])

    def fwd(_, x):
        return _blur_fwd_impl(x, taps_y, taps_x, pad)

    def bwd(_, ct):
        return _blur_fwd_impl(ct, taps_y[::-1], taps_x[::-1], tp)

    return jax.custom_derivatives.linear_call(fwd, bwd, (), x)
