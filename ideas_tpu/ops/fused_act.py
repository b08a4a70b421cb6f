"""Fused bias + leaky-ReLU, TPU-native.

Semantics of the reference CUDA op (`/root/reference/stylegan2/op/
fused_bias_act_kernel.cu:18-49`, Python wrapper `fused_act.py`):

    y = leaky_relu(x + b[channel], negative_slope=0.2) * sqrt(2)

with per-channel bias broadcast over all other axes (channel is the last
axis here; the NCHW reference broadcasts over dim 1). The CUDA op also
implements grad and double-grad modes keyed off a reference tensor
(`fused_bias_act_kernel.cu:36-45`) because the R1 penalty differentiates
through discriminator activations; in JAX the double-backward falls out
of autodiff through the `custom_vjp` below (the VJP body is itself
differentiable: it is a `where`-mask multiply).

Two implementations behind one API:
  * `_fused_leaky_relu_xla` — pure jnp; XLA fuses it into neighbouring ops.
  * `_fused_leaky_relu_pallas` — a Pallas VMEM kernel for the standalone
    (memory-bound) case, mirroring the reference's decision to fuse
    bias+activation into one memory pass.
The public `fused_leaky_relu` dispatches on `use_pallas` (default: XLA,
which on TPU fuses this into the producing conv — strictly better than a
separate kernel launch when a producer exists).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

NEGATIVE_SLOPE = 0.2
SCALE = math.sqrt(2.0)


def scaled_leaky_relu(x: jnp.ndarray, negative_slope: float = NEGATIVE_SLOPE) -> jnp.ndarray:
    """leaky_relu(x) * sqrt(2) (`stylegan2/model.py:169-178`), no bias."""
    return jnp.where(x >= 0, x, x * negative_slope) * jnp.asarray(SCALE, x.dtype)


def _fused_leaky_relu_xla(x, bias, negative_slope, scale):
    if bias is not None:
        bias = bias.reshape((1,) * (x.ndim - 1) + (-1,)).astype(x.dtype)
        x = x + bias
    return jnp.where(x >= 0, x, x * negative_slope) * jnp.asarray(scale, x.dtype)


# ---------------------------------------------------------------------------
# Pallas kernel: one VMEM pass over (rows, channels) tiles.
# ---------------------------------------------------------------------------


def _flrelu_kernel(x_ref, b_ref, o_ref, *, negative_slope, scale):
    x = x_ref[...]
    b = b_ref[...]
    y = x + b[None, :].astype(x.dtype)
    o_ref[...] = jnp.where(y >= 0, y, y * negative_slope) * jnp.asarray(scale, x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fused_leaky_relu_pallas(x, bias, negative_slope, scale):
    return _flrelu_fwd_impl(x, bias, negative_slope, scale)


@functools.lru_cache(None)
def _use_interpret() -> bool:
    """Pallas compiles only on TPU; interpret elsewhere (CPU tests)."""
    return jax.default_backend() not in ("tpu", "axon")


def _flrelu_fwd_impl(x, bias, negative_slope, scale):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_shape = x.shape
    c = orig_shape[-1]
    rows = int(np_prod(orig_shape[:-1]))
    x2 = x.reshape(rows, c)

    # Row-tiled grid; channels stay whole (c is 8..2048 in this model zoo).
    row_tile = min(rows, max(8, 1024 // max(1, c // 128)))
    row_tile = max(1, row_tile)
    grid = (pl.cdiv(rows, row_tile),)

    out = pl.pallas_call(
        functools.partial(_flrelu_kernel, negative_slope=negative_slope, scale=scale),
        out_shape=jax.ShapeDtypeStruct((rows, c), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((row_tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=_use_interpret(),
    )(x2, bias.astype(x.dtype))
    return out.reshape(orig_shape)


def _flrelu_fwd(x, bias, negative_slope, scale):
    y = _flrelu_fwd_impl(x, bias, negative_slope, scale)
    # Save the sign mask via y (y >= 0 <=> x + b >= 0 because scale > 0),
    # matching the reference's `refer`-tensor trick
    # (`fused_bias_act_kernel.cu:42-44`): grad only needs the output sign.
    return y, (y,)


def _flrelu_bwd(negative_slope, scale, res, g):
    (y,) = res
    factor = jnp.where(y >= 0, jnp.asarray(scale, g.dtype),
                       jnp.asarray(scale * negative_slope, g.dtype))
    dx = g * factor
    db = jnp.sum(dx, axis=tuple(range(dx.ndim - 1)))
    return dx, db.astype(g.dtype)


_fused_leaky_relu_pallas.defvjp(_flrelu_fwd, _flrelu_bwd)


def np_prod(xs) -> int:
    out = 1
    for v in xs:
        out *= int(v)
    return out


def fused_leaky_relu(
    x: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    negative_slope: float = NEGATIVE_SLOPE,
    scale: float = SCALE,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """y = leaky_relu(x + bias, slope) * scale, bias broadcast on last axis."""
    if use_pallas and bias is not None:
        return _fused_leaky_relu_pallas(x, bias, negative_slope, scale)
    return _fused_leaky_relu_xla(x, bias, negative_slope, scale)
