"""Equalized-LR NN primitives, NHWC, TPU-first.

Rebuilt from the semantics of `/root/reference/stylegan2/model.py` and the
IDEAS layer variants in `/root/reference/models.py:11-227`. Key TPU-native
departures from the reference:

  * NHWC activations / HWIO weights throughout (TPU conv layout) instead
    of NCHW/OIHW.
  * `ModulatedConv2d` (`stylegan2/model.py:181-277`) replaces the
    grouped-conv-with-batch-expanded-weights trick (GPU-idiomatic,
    `stylegan2/model.py:246-275`) with the algebraically equivalent
    scale-inputs / demodulate-outputs formulation: one large batched XLA
    conv that tiles cleanly onto the MXU, plus a (B,in)x(in,out) matmul
    for the demodulation coefficients. Equivalence holds exactly because
    conv is linear in both input-channel scaling and output-channel
    scaling, including the demod epsilon (1e-8, `stylegan2/model.py:243`).
  * Blur/up/down paths route through `ideas_tpu.ops.upfirdn2d`, whose XLA
    transpose rule reproduces the reference's analytic gradient.

All weights init as N(0, 1) with the He scale applied at *runtime*
(equalized learning rate, `stylegan2/model.py:94-166`).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from ideas_tpu import parallel
from ideas_tpu.ops import phase_upsample
from ideas_tpu.ops.fused_act import fused_leaky_relu, scaled_leaky_relu
from ideas_tpu.ops.upfirdn2d import blur

Dtype = Any

normal_init = nn.initializers.normal(stddev=1.0)


def _conv(x, w, *, stride=1, padding=0, dtype=None):
    """Plain NHWC/HWIO conv with symmetric int padding."""
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype,
    )


def _conv_transpose(x, w, *, stride=2):
    """Torch-semantics conv_transpose2d with padding=0.

    Equivalent to `F.conv_transpose2d(x, w, stride=stride, padding=0)`
    (used in `stylegan2/model.py:258` and `models.py:31-40`): dilate the
    input by `stride`, full-pad, and correlate with the spatially flipped
    kernel. `w` is HWIO (kh, kw, in, out).
    """
    kh, kw = w.shape[0], w.shape[1]
    w = jnp.flip(w, (0, 1))
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=((kh - 1, kh - 1), (kw - 1, kw - 1)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class PixelNorm(nn.Module):
    """x * rsqrt(mean(x^2, channel) + 1e-8) (`stylegan2/model.py:14-19`)."""

    @nn.compact
    def __call__(self, x):
        return x * lax.rsqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) + 1e-8)


class EqualLinear(nn.Module):
    """Equalized-lr linear (`stylegan2/model.py:132-166`).

    weight ~ N(0, 1/lr_mul); forward scale = lr_mul/sqrt(in_dim); bias
    stored at bias_init and scaled by lr_mul. `activation='fused_lrelu'`
    applies the fused bias + leaky-ReLU instead of a plain bias add.
    """

    out_dim: int
    use_bias: bool = True
    bias_init: float = 0.0
    lr_mul: float = 1.0
    activation: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        w = self.param(
            "weight",
            nn.initializers.normal(stddev=1.0 / self.lr_mul),
            (in_dim, self.out_dim),
            jnp.float32,
        )
        scale = (1.0 / math.sqrt(in_dim)) * self.lr_mul
        y = jnp.dot(x.astype(self.dtype), (w * scale).astype(self.dtype),
                    preferred_element_type=self.dtype)
        if self.use_bias:
            b = self.param(
                "bias",
                nn.initializers.constant(self.bias_init),
                (self.out_dim,),
                jnp.float32,
            )
            b = b * self.lr_mul
            if self.activation == "fused_lrelu":
                return fused_leaky_relu(y, b.astype(self.dtype))
            return y + b.astype(self.dtype)
        if self.activation == "fused_lrelu":
            return fused_leaky_relu(y, None)
        return y


class EqualConv2d(nn.Module):
    """Equalized-lr conv (`stylegan2/model.py:94-129`). Weight HWIO."""

    out_channel: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = parallel.auto_spatial_constraint(x)
        in_channel = x.shape[-1]
        w = self.param(
            "weight",
            normal_init,
            (self.kernel_size, self.kernel_size, in_channel, self.out_channel),
            jnp.float32,
        )
        scale = 1.0 / math.sqrt(in_channel * self.kernel_size ** 2)
        y = _conv(
            x.astype(self.dtype),
            (w * scale).astype(self.dtype),
            stride=self.stride,
            padding=self.padding,
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channel,), jnp.float32)
            y = y + b.astype(y.dtype)
        return y


class EqualConvTranspose2d(nn.Module):
    """Equalized-lr transposed conv (`models.py:11-46`). Weight HWIO (I=in)."""

    out_channel: int
    kernel_size: int
    stride: int = 2
    use_bias: bool = True
    # When set (and bias-free), the trailing FIR blur of the StyleGAN2 up
    # path is folded into this conv as a dense phase conv (exact rewrite,
    # ops/phase_upsample.py); the caller then skips its own blur().
    fuse_blur_taps: Optional[Tuple[int, ...]] = None
    fuse_blur_pad: Optional[Tuple[int, int]] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = parallel.auto_spatial_constraint(x)
        in_channel = x.shape[-1]
        w = self.param(
            "weight",
            normal_init,
            (self.kernel_size, self.kernel_size, in_channel, self.out_channel),
            jnp.float32,
        )
        scale = 1.0 / math.sqrt(in_channel * self.kernel_size ** 2)
        if self.fuse_blur_taps is not None:
            assert not self.use_bias, "fused up path requires bias-free conv"
            assert self.stride == 2
            # NB: the reference's ConvLayer blur has NO upsample gain
            # (`models.py:95` passes no upsample_factor), unlike the
            # modulated-conv up path -> gain=1.
            return phase_upsample.fused_upsample_conv(
                x.astype(self.dtype), w * scale, self.fuse_blur_taps,
                pad=self.fuse_blur_pad, gain=1.0,
            )
        y = _conv_transpose(
            x.astype(self.dtype), (w * scale).astype(self.dtype), stride=self.stride
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channel,), jnp.float32)
            y = y + b.astype(y.dtype)
        return y


class ModulatedConv2d(nn.Module):
    """StyleGAN2 modulated conv, scale-input / demodulate-output form.

    Matches `stylegan2/model.py:181-277`:
      style -> EqualLinear(style_dim -> in, bias_init=1) = s        (B, in)
      w_eff[b,o,i,k] = scale * W[o,i,k] * s[b,i]
      demod[b,o]     = rsqrt(sum_{i,k} w_eff^2 + 1e-8)
      y[b,o] = demod[b,o] * conv(x[b] * s[b], scale * W)[o]
    The demod sum factorizes: sum_i s[b,i]^2 * (scale^2 sum_k W[o,i,k]^2),
    computed as one (B,in)@(in,out) matmul in fp32.
    Up path: conv_transpose(stride 2) + blur (gain 4); down path:
    blur + stride-2 conv — pad arithmetic per `stylegan2/model.py:202-216`.
    """

    out_channel: int
    kernel_size: int
    demodulate: bool = True
    upsample: bool = False
    downsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, style):
        x = parallel.auto_spatial_constraint(x)
        in_channel = x.shape[-1]
        k = self.kernel_size
        w = self.param(
            "weight", normal_init, (k, k, in_channel, self.out_channel), jnp.float32
        )
        scale = 1.0 / math.sqrt(in_channel * k ** 2)

        # Per-sample input-channel modulation (fp32 for the demod math).
        s = EqualLinear(
            in_channel, bias_init=1.0, name="modulation", dtype=jnp.float32
        )(style.astype(jnp.float32))  # (B, in)

        if self.demodulate:
            w2 = (scale * w.astype(jnp.float32)) ** 2
            w2 = jnp.sum(w2, axis=(0, 1))  # (in, out)
            demod = lax.rsqrt(
                jnp.dot(jnp.square(s), w2, preferred_element_type=jnp.float32) + 1e-8
            )  # (B, out)

        xm = x.astype(self.dtype) * s[:, None, None, :].astype(self.dtype)
        ws = (w * scale).astype(self.dtype)

        if self.upsample:
            factor = 2
            p = (len(self.blur_kernel) - factor) - (k - 1)
            pad0 = (p + 1) // 2 + factor - 1
            pad1 = p // 2 + 1
            if phase_upsample.enabled() and phase_upsample.fusable(
                k, self.blur_kernel, (pad0, pad1)
            ):
                # conv_transpose + blur as ONE dense phase conv (exact;
                # see ops/phase_upsample.py). Composed kernel built from
                # the fp32 weights, cast once to the compute dtype.
                y = phase_upsample.fused_upsample_conv(
                    xm, w.astype(jnp.float32) * scale, self.blur_kernel,
                    pad=(pad0, pad1), gain=float(factor ** 2),
                )
            else:
                y = _conv_transpose(xm, ws, stride=2)
                y = blur(y, self.blur_kernel, pad=(pad0, pad1),
                         upsample_factor=factor)
        elif self.downsample:
            factor = 2
            p = (len(self.blur_kernel) - factor) + (k - 1)
            pad0 = (p + 1) // 2
            pad1 = p // 2
            xm = blur(xm, self.blur_kernel, pad=(pad0, pad1))
            y = _conv(xm, ws, stride=2, padding=0)
        else:
            y = _conv(xm, ws, stride=1, padding=k // 2)

        if self.demodulate:
            y = y * demod[:, None, None, :].astype(y.dtype)
        return y


class StyledConv(nn.Module):
    """ModulatedConv2d + FusedLeakyReLU, *no noise injection*.

    IDEAS imports `StyledConv_without_noise` as its StyledConv
    (`models.py:7`, `stylegan2/model.py:343-377`); noise injection is
    deliberately absent so the image is a deterministic function of
    (structure, texture) — required for message recovery.
    """

    out_channel: int
    kernel_size: int
    upsample: bool = False
    demodulate: bool = True
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, style):
        y = ModulatedConv2d(
            self.out_channel,
            self.kernel_size,
            demodulate=self.demodulate,
            upsample=self.upsample,
            blur_kernel=self.blur_kernel,
            name="conv",
            dtype=self.dtype,
        )(x, style)
        b = self.param("bias", nn.initializers.zeros, (self.out_channel,), jnp.float32)
        return fused_leaky_relu(y, b.astype(y.dtype))


class ConvLayer(nn.Module):
    """IDEAS ConvLayer (`models.py:49-134`): optional blur-down / transpose-up,
    zero / reflect / valid padding, and tanh | fused-lrelu | scaled-lrelu tail."""

    out_channel: int
    kernel_size: int
    upsample: bool = False
    downsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    use_bias: bool = True
    activate: bool = True
    padding: str = "zero"
    tanh: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        conv_bias = self.use_bias and not self.activate

        if self.downsample:
            factor = 2
            p = (len(self.blur_kernel) - factor) + (k - 1)
            pad0 = (p + 1) // 2
            pad1 = p // 2
            x = blur(x, self.blur_kernel, pad=(pad0, pad1))
            y = EqualConv2d(
                self.out_channel, k, stride=2, padding=0,
                use_bias=conv_bias, name="conv", dtype=self.dtype,
            )(x)
        elif self.upsample:
            factor = 2
            p = (len(self.blur_kernel) - factor) - (k - 1)
            pad0 = (p + 1) // 2 + factor - 1
            pad1 = p // 2 + 1
            fuse = (
                not conv_bias
                and phase_upsample.enabled()
                and phase_upsample.fusable(k, self.blur_kernel, (pad0, pad1))
            )
            y = EqualConvTranspose2d(
                self.out_channel, k, stride=2, use_bias=conv_bias,
                fuse_blur_taps=tuple(self.blur_kernel) if fuse else None,
                fuse_blur_pad=(pad0, pad1) if fuse else None,
                name="conv", dtype=self.dtype,
            )(x)
            if not fuse:
                y = blur(y, self.blur_kernel, pad=(pad0, pad1))
        else:
            pad = 0
            if self.padding == "zero":
                pad = (k - 1) // 2
            elif self.padding == "reflect":
                rp = (k - 1) // 2
                if rp > 0:
                    x = jnp.pad(x, ((0, 0), (rp, rp), (rp, rp), (0, 0)), mode="reflect")
            elif self.padding != "valid":
                raise ValueError('padding must be "zero", "reflect", or "valid"')
            y = EqualConv2d(
                self.out_channel, k, stride=1, padding=pad,
                use_bias=conv_bias, name="conv", dtype=self.dtype,
            )(x)

        if self.activate:
            if self.tanh:
                return jnp.tanh(y)
            if self.use_bias:
                b = self.param(
                    "bias", nn.initializers.zeros, (self.out_channel,), jnp.float32
                )
                return fused_leaky_relu(y, b.astype(y.dtype))
            return scaled_leaky_relu(y)
        return y


class StyledResBlock(nn.Module):
    """Two styled convs + 1x1 (optionally upsampling) skip, / sqrt(2)
    (`models.py:137-178`)."""

    out_channel: int
    upsample: bool
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, style):
        in_channel = x.shape[-1]
        y = StyledConv(
            self.out_channel, 3, upsample=self.upsample,
            blur_kernel=self.blur_kernel, name="conv1", dtype=self.dtype,
        )(x, style)
        y = StyledConv(
            self.out_channel, 3, name="conv2", dtype=self.dtype,
        )(y, style)

        if self.upsample or in_channel != self.out_channel:
            skip = ConvLayer(
                self.out_channel, 1, upsample=self.upsample,
                blur_kernel=self.blur_kernel, use_bias=False, activate=False,
                name="skip", dtype=self.dtype,
            )(x)
        else:
            skip = x
        return (y + skip) / math.sqrt(2)


class ResBlock(nn.Module):
    """Conv3x3 + (optionally downsampling) conv3x3 + skip, / sqrt(2)
    (`models.py:181-227`)."""

    out_channel: int
    downsample: bool
    padding: str = "zero"
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    mid_channel: Optional[int] = None  # conv1 width; SG2's D uses in_channel
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_channel = x.shape[-1]
        y = ConvLayer(
            self.mid_channel or self.out_channel, 3, padding=self.padding,
            name="conv1", dtype=self.dtype,
        )(x)
        y = ConvLayer(
            self.out_channel, 3, downsample=self.downsample, padding=self.padding,
            blur_kernel=self.blur_kernel, name="conv2", dtype=self.dtype,
        )(y)

        if self.downsample or in_channel != self.out_channel:
            skip = ConvLayer(
                self.out_channel, 1, downsample=self.downsample,
                blur_kernel=self.blur_kernel, use_bias=False, activate=False,
                name="skip", dtype=self.dtype,
            )(x)
        else:
            skip = x
        return (y + skip) / math.sqrt(2)
