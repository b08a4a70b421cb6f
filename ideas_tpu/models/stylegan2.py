"""Vanilla StyleGAN2 generator/discriminator (the reference side tree,
`/root/reference/stylegan2/model.py:402-713`), NHWC / TPU-native.

Used by the standalone StyleGAN2 tooling (training, sampling, projection,
FID/PPL) that the reference ships alongside IDEAS. The IDEAS networks do
NOT use these — they use the no-noise styled blocks in
`ideas_tpu.models.ideas`.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ideas_tpu.nn.layers import (
    ConvLayer,
    EqualLinear,
    ModulatedConv2d,
    PixelNorm,
    ResBlock,
)
from ideas_tpu.ops.upfirdn2d import upsample2x

Dtype = Any


def sg2_channels(channel_multiplier: int = 2):
    """Per-resolution channels (`stylegan2/model.py:429-439`)."""
    return {
        4: 512,
        8: 512,
        16: 512,
        32: 512,
        64: 256 * channel_multiplier,
        128: 128 * channel_multiplier,
        256: 64 * channel_multiplier,
        512: 32 * channel_multiplier,
        1024: 16 * channel_multiplier,
    }


class NoisyStyledConv(nn.Module):
    """ModulatedConv2d + noise injection + FusedLeakyReLU
    (`stylegan2/model.py:307-341` — the *with*-noise variant)."""

    out_channel: int
    kernel_size: int
    upsample: bool = False
    demodulate: bool = True
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, style, noise=None, noise_key=None):
        from ideas_tpu.ops.fused_act import fused_leaky_relu

        y = ModulatedConv2d(
            self.out_channel,
            self.kernel_size,
            demodulate=self.demodulate,
            upsample=self.upsample,
            blur_kernel=self.blur_kernel,
            name="conv",
            dtype=self.dtype,
        )(x, style)
        nw = self.param("noise_weight", nn.initializers.zeros, (), jnp.float32)
        if noise is None and noise_key is not None:
            noise = jax.random.normal(
                noise_key, (y.shape[0], y.shape[1], y.shape[2], 1), y.dtype
            )
        if noise is not None:
            y = y + nw.astype(y.dtype) * noise
        b = self.param("bias", nn.initializers.zeros, (self.out_channel,), jnp.float32)
        return fused_leaky_relu(y, b.astype(y.dtype))


class ToRGB(nn.Module):
    """Skip-sum RGB head (`stylegan2/model.py:380-399`): demod-free 1x1
    modconv + bias, plus FIR-upsampled skip accumulation."""

    upsample: bool = True
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, style, skip=None):
        y = ModulatedConv2d(
            3, 1, demodulate=False, name="conv", dtype=self.dtype
        )(x, style)
        b = self.param("bias", nn.initializers.zeros, (3,), jnp.float32)
        y = y + b.astype(y.dtype)
        if skip is not None:
            skip = upsample2x(skip, self.blur_kernel)
            y = y + skip
        return y


class SG2Generator(nn.Module):
    """StyleGAN2 generator (`stylegan2/model.py:402-581`): 8-layer z->w
    mapping MLP, learned 4x4 constant input, skip-ToRGB synthesis pyramid,
    style mixing, truncation, per-layer noise."""

    size: int
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    lr_mlp: float = 0.01
    dtype: Dtype = jnp.float32

    @property
    def log_size(self) -> int:
        return int(math.log2(self.size))

    @property
    def num_layers(self) -> int:
        return (self.log_size - 2) * 2 + 1

    @property
    def n_latent(self) -> int:
        return self.log_size * 2 - 2

    def setup(self):
        channels = sg2_channels(self.channel_multiplier)

        self.mapping = [
            EqualLinear(
                self.style_dim, lr_mul=self.lr_mlp, activation="fused_lrelu",
                name=f"mapping{i}", dtype=self.dtype,
            )
            for i in range(self.n_mlp)
        ]
        self.const_input = self.param(
            "const_input", nn.initializers.normal(1.0), (1, 4, 4, channels[4]),
            jnp.float32,
        )
        self.conv1 = NoisyStyledConv(
            channels[4], 3, blur_kernel=self.blur_kernel, name="conv1",
            dtype=self.dtype,
        )
        self.to_rgb1 = ToRGB(upsample=False, name="to_rgb1", dtype=self.dtype)

        convs = []
        to_rgbs = []
        in_ch = channels[4]
        for i in range(3, self.log_size + 1):
            out_ch = channels[2 ** i]
            convs.append(
                NoisyStyledConv(
                    out_ch, 3, upsample=True, blur_kernel=self.blur_kernel,
                    name=f"conv_up{i}", dtype=self.dtype,
                )
            )
            convs.append(
                NoisyStyledConv(
                    out_ch, 3, blur_kernel=self.blur_kernel,
                    name=f"conv{i}", dtype=self.dtype,
                )
            )
            to_rgbs.append(
                ToRGB(blur_kernel=self.blur_kernel, name=f"to_rgb{i}",
                      dtype=self.dtype)
            )
            in_ch = out_ch
        self.convs = convs
        self.to_rgbs = to_rgbs

    def map_latent(self, z):
        """z -> w through PixelNorm + the mapping MLP."""
        w = z * jax.lax.rsqrt(jnp.mean(jnp.square(z), -1, keepdims=True) + 1e-8)
        for layer in self.mapping:
            w = layer(w)
        return w

    def mean_latent(self, key, n_latent: int):
        z = jax.random.normal(key, (n_latent, self.style_dim))
        return jnp.mean(self.map_latent(z), axis=0, keepdims=True)

    def __call__(
        self,
        styles,
        input_is_latent: bool = False,
        inject_index: Optional[int] = None,
        truncation: float = 1.0,
        truncation_latent=None,
        noise=None,
        noise_key=None,
        return_latents: bool = False,
    ):
        if not isinstance(styles, (list, tuple)):
            styles = [styles]
        if not input_is_latent:
            styles = [self.map_latent(s) for s in styles]

        if truncation < 1.0 and truncation_latent is not None:
            styles = [
                truncation_latent + truncation * (s - truncation_latent)
                for s in styles
            ]

        if len(styles) < 2:
            if styles[0].ndim < 3:
                latent = jnp.repeat(styles[0][:, None, :], self.n_latent, axis=1)
            else:
                latent = styles[0]
        else:
            idx = inject_index if inject_index is not None else self.n_latent // 2
            l1 = jnp.repeat(styles[0][:, None, :], idx, axis=1)
            l2 = jnp.repeat(styles[1][:, None, :], self.n_latent - idx, axis=1)
            latent = jnp.concatenate([l1, l2], axis=1)

        if noise is None:
            if noise_key is not None:
                nkeys = list(jax.random.split(noise_key, self.num_layers))
            else:
                nkeys = [None] * self.num_layers
            noise = [None] * self.num_layers
        else:
            nkeys = [None] * self.num_layers

        b = latent.shape[0]
        y = jnp.repeat(self.const_input.astype(self.dtype), b, axis=0)
        y = self.conv1(y, latent[:, 0], noise=noise[0], noise_key=nkeys[0])
        skip = self.to_rgb1(y, latent[:, 1])

        i = 1
        for k in range(0, len(self.convs), 2):
            y = self.convs[k](
                y, latent[:, i], noise=noise[k + 1], noise_key=nkeys[k + 1]
            )
            y = self.convs[k + 1](
                y, latent[:, i + 1], noise=noise[k + 2], noise_key=nkeys[k + 2]
            )
            skip = self.to_rgbs[k // 2](y, latent[:, i + 2], skip)
            i += 2

        if return_latents:
            return skip, latent
        return skip, None


class SG2Discriminator(nn.Module):
    """StyleGAN2 discriminator with minibatch-stddev
    (`stylegan2/model.py:654-713`)."""

    size: int
    channel_multiplier: int = 2
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    stddev_group: int = 4
    stddev_feat: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        channels = sg2_channels(self.channel_multiplier)
        log_size = int(math.log2(self.size))
        y = ConvLayer(channels[self.size], 1, name="conv0", dtype=self.dtype)(x)
        for j, i in enumerate(range(log_size, 2, -1)):
            # SG2's ResBlock convs are (in->in, in->out/down)
            # (`stylegan2/model.py:633-651`): mid_channel = in_channel.
            y = ResBlock(
                channels[2 ** (i - 1)], downsample=True,
                blur_kernel=self.blur_kernel, mid_channel=y.shape[-1],
                name=f"res{j}", dtype=self.dtype,
            )(y)

        # Minibatch stddev (`stylegan2/model.py:697-705`).
        b, h, w, c = y.shape
        group = min(b, self.stddev_group)
        g = y.reshape(group, -1, h, w, self.stddev_feat, c // self.stddev_feat)
        var = jnp.var(g, axis=0)
        stddev = jnp.sqrt(var + 1e-8)
        stddev = jnp.mean(stddev, axis=(1, 2, 4), keepdims=True)
        stddev = stddev.squeeze(4)
        stddev = jnp.tile(stddev, (group, h, w, 1))
        y = jnp.concatenate([y, stddev.astype(y.dtype)], axis=-1)

        y = ConvLayer(channels[4], 3, name="final_conv", dtype=self.dtype)(y)
        y = y.reshape(b, -1)
        y = EqualLinear(
            channels[4], activation="fused_lrelu", name="final_linear0",
            dtype=self.dtype,
        )(y)
        return EqualLinear(1, name="final_linear1", dtype=self.dtype)(y)
