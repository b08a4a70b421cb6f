"""The seven IDEAS networks (`/root/reference/models.py:230-513`), NHWC.

Shapes at the paper config (256^2 input, channel=32, structure_channel=8,
texture_channel=2048, N=1):

    DisentanglementEncoder:  (B,256,256,3) -> S (B,16,16,8), T (B,2048)
    Generator:               S (B,16,16,8) + T (B,2048) -> (B,256,256,3)
    StructureGenerator:      Z (B,16,16,N) -> S2 (B,16,16,8)
    TensorExtractor:         S (B,16,16,8) -> Z_hat (B,16,16,N)
    ImageLevelDiscriminator: (B,256,256,3) -> (B,1)
    CooccurenceDiscriminator:patches -> (B*n_crop,1)
    DistributionDiscriminator: T (B,2048) -> (B,1)
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ideas_tpu.nn.layers import (
    ConvLayer,
    EqualLinear,
    ResBlock,
    StyledResBlock,
)

Dtype = Any


class DisentanglementEncoder(nn.Module):
    """Image -> (structure S, texture T) (`models.py:230-268`).

    Stem: 1x1 conv + four stride-2 reflect-pad ResBlocks with channels
    ch*2^i (spatial /16). Structure head: two 1x1 convs -> structure_channel.
    Texture head: two valid-pad downsampling 3x3 convs -> global average
    pool -> 1x1 conv with tanh -> texture vector in [-1, 1].
    """

    channel: int
    structure_channel: int = 8
    texture_channel: int = 2048
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if x.shape[1] < 64 or x.shape[2] < 64:
            raise ValueError(
                f"DisentanglementEncoder needs inputs >= 64x64 (got "
                f"{x.shape[1]}x{x.shape[2]}): the valid-pad texture head "
                "(models.py:255-260 semantics) collapses below that."
            )
        ch = self.channel
        y = ConvLayer(ch, 1, name="stem0", dtype=self.dtype)(x)
        for i in range(1, 5):
            y = ResBlock(
                ch * (2 ** i), downsample=True, padding="reflect",
                blur_kernel=self.blur_kernel, name=f"stem{i}", dtype=self.dtype,
            )(y)
        in_ch = ch * 16

        structure = ConvLayer(
            in_ch, 1, blur_kernel=self.blur_kernel, name="structure0", dtype=self.dtype
        )(y)
        structure = ConvLayer(
            self.structure_channel, 1, blur_kernel=self.blur_kernel,
            name="structure1", dtype=self.dtype,
        )(structure)

        t = ConvLayer(
            in_ch * 2, 3, downsample=True, padding="valid",
            blur_kernel=self.blur_kernel, name="texture0", dtype=self.dtype,
        )(y)
        t = ConvLayer(
            in_ch * 4, 3, downsample=True, padding="valid",
            blur_kernel=self.blur_kernel, name="texture1", dtype=self.dtype,
        )(t)
        t = jnp.mean(t, axis=(1, 2), keepdims=True)  # AdaptiveAvgPool2d(1)
        t = ConvLayer(
            self.texture_channel, 1, tanh=True, blur_kernel=self.blur_kernel,
            name="texture2", dtype=self.dtype,
        )(t)
        texture = t.reshape(t.shape[0], -1)
        return structure, texture


class Generator(nn.Module):
    """(S, T) -> image (`models.py:271-306`).

    Eight StyledResBlocks with channel multipliers (4,8,12,16,16,16,8,4)
    and upsampling on the last four (16^2 -> 256^2); the texture vector is
    the style input of every block; final un-activated 1x1 to RGB.
    """

    channel: int
    structure_channel: int = 8
    texture_channel: int = 2048
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    remat: bool = False  # rematerialize blocks: trade FLOPs for HBM
    dtype: Dtype = jnp.float32

    ch_multiplier: Sequence[int] = (4, 8, 12, 16, 16, 16, 8, 4)
    upsample: Sequence[bool] = (False, False, False, False, True, True, True, True)

    @nn.compact
    def __call__(self, structure, texture):
        block_cls = nn.remat(StyledResBlock) if self.remat else StyledResBlock
        y = structure
        for i, (mul, up) in enumerate(zip(self.ch_multiplier, self.upsample)):
            y = block_cls(
                self.channel * mul, upsample=up, blur_kernel=self.blur_kernel,
                name=f"layer{i}", dtype=self.dtype,
            )(y, texture)
        y = ConvLayer(3, 1, activate=False, name="to_rgb", dtype=self.dtype)(y)
        return y


class StructureGenerator(nn.Module):
    """Secret tensor Z -> structure S2 (`models.py:309-329`)."""

    channel: int
    N: int = 1
    structure_channel: int = 8
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        ch = self.channel
        y = ConvLayer(ch, 1, blur_kernel=self.blur_kernel, name="stem0", dtype=self.dtype)(z)
        for i, mul in enumerate((2, 4, 2)):
            y = ResBlock(
                ch * mul, downsample=False, padding="reflect",
                blur_kernel=self.blur_kernel, name=f"stem{i + 1}", dtype=self.dtype,
            )(y)
        y = ConvLayer(
            self.structure_channel, 1, blur_kernel=self.blur_kernel,
            name="stem4", dtype=self.dtype,
        )(y)
        return y


class TensorExtractor(nn.Module):
    """Recovered structure -> secret tensor Z_hat (`models.py:444-465`)."""

    channel: int
    N: int = 1
    structure_channel: int = 8
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, s):
        ch = self.channel
        y = ConvLayer(ch * 2, 1, blur_kernel=self.blur_kernel, name="stem0", dtype=self.dtype)(s)
        for i, mul in enumerate((4, 2, 1)):
            y = ResBlock(
                ch * mul, downsample=False, padding="reflect",
                blur_kernel=self.blur_kernel, name=f"stem{i + 1}", dtype=self.dtype,
            )(y)
        y = ConvLayer(self.N, 1, blur_kernel=self.blur_kernel, name="stem4", dtype=self.dtype)(y)
        return y


def _channels_dict(channel_multiplier: int):
    """Per-resolution channel table (`models.py:336-346`)."""
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


class ImageLevelDiscriminator(nn.Module):
    """StyleGAN2-style image discriminator without minibatch-stddev
    (`models.py:332-376`)."""

    size: int
    channel_multiplier: int = 1
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        channels = _channels_dict(self.channel_multiplier)
        log_size = int(math.log2(self.size))
        y = ConvLayer(
            channels[self.size], 1, blur_kernel=self.blur_kernel,
            name="conv0", dtype=self.dtype,
        )(x)
        for j, i in enumerate(range(log_size, 2, -1)):
            y = ResBlock(
                channels[2 ** (i - 1)], downsample=True,
                blur_kernel=self.blur_kernel, name=f"res{j}", dtype=self.dtype,
            )(y)
        y = ConvLayer(
            channels[4], 3, blur_kernel=self.blur_kernel,
            name="final_conv", dtype=self.dtype,
        )(y)
        y = y.reshape(y.shape[0], -1)
        y = EqualLinear(
            channels[4], activation="fused_lrelu", name="final_linear0", dtype=self.dtype
        )(y)
        y = EqualLinear(1, name="final_linear1", dtype=self.dtype)(y)
        return y


class CooccurenceDiscriminator(nn.Module):
    """Patch co-occurrence critic (`models.py:379-426`).

    A shared conv encoder embeds both the input patch and `ref_batch`
    reference patches; reference embeddings are mean-pooled per group,
    concatenated with the input embedding, and scored by a 4-layer MLP.
    The reference's two-call protocol with `ref_input` caching
    (`train.py:84-85`) is restructured functionally: `encode()` exposes
    the patch embedding so callers compute reference features once.
    """

    channel: int
    size: int = 256
    dtype: Dtype = jnp.float32

    ch_multiplier: Sequence[int] = (2, 4, 8, 12, 12, 24)

    def setup(self):
        ch = self.channel
        # The reference always downsamples in the first five ResBlocks
        # (`models.py:385-386`), which requires patches (size/4) of at
        # least 64 px — i.e. image_size >= 256. For smaller sizes (used
        # in tests / fast configs) we reduce the number of downsampling
        # stages so the pre-head feature map is 2x2; at 256..511 and
        # >511 this reproduces the reference exactly.
        patch_size = self.size // 4
        n_down = min(5, max(1, int(math.log2(patch_size)) - 1))
        downsample = tuple(i < n_down for i in range(6))
        enc = [ConvLayer(ch, 1, name="enc0", dtype=self.dtype)]
        for i, (mul, down) in enumerate(zip(self.ch_multiplier, downsample)):
            enc.append(
                ResBlock(ch * mul, downsample=down, name=f"enc{i + 1}", dtype=self.dtype)
            )
        if self.size > 511:
            k_size, feat_size = 3, 2 * 2
        else:
            k_size, feat_size = 2, 1 * 1
        enc.append(
            ConvLayer(ch * 12, k_size, padding="valid", name="enc_final", dtype=self.dtype)
        )
        self.encoder = enc
        self.feat_size = feat_size
        self.linear = [
            EqualLinear(ch * 32, activation="fused_lrelu", name="lin0", dtype=self.dtype),
            EqualLinear(ch * 32, activation="fused_lrelu", name="lin1", dtype=self.dtype),
            EqualLinear(ch * 16, activation="fused_lrelu", name="lin2", dtype=self.dtype),
            EqualLinear(1, name="lin3", dtype=self.dtype),
        ]

    def encode(self, patches):
        y = patches
        for layer in self.encoder:
            y = layer(y)
        return y  # (P, h, w, ch*12)

    def score(self, feat_input, feat_ref):
        y = jnp.concatenate([feat_input, feat_ref], axis=-1)
        y = y.reshape(y.shape[0], -1)
        for layer in self.linear:
            y = layer(y)
        return y

    def __call__(self, patches, reference=None, ref_batch=None, ref_input=None):
        feat = self.encode(patches)
        if ref_input is None:
            r = self.encode(reference)
            p, h, w, c = r.shape
            ref_input = r.reshape(-1, ref_batch, h, w, c).mean(axis=1)
        return self.score(feat, ref_input), ref_input


class DistributionDiscriminator(nn.Module):
    """Texture-distribution critic: MLP 2048->512->128->32->1, all
    fused-lrelu (`models.py:429-441`); pushes encoder textures toward
    U(-1, 1)."""

    texture_channel: int = 2048
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t):
        tc = self.texture_channel
        if tc < 64:
            raise ValueError(
                f"texture_channel must be >= 64 (got {tc}): the MLP widths "
                "are tc/4, tc/16, tc/64 (models.py:432-437 semantics)."
            )
        y = t
        for i, dim in enumerate((tc // 4, tc // 16, tc // 64, 1)):
            y = EqualLinear(
                dim, activation="fused_lrelu", name=f"lin{i}", dtype=self.dtype
            )(y)
        return y


def init_model(name: str, args) -> nn.Module:
    """String -> module factory mirroring `models.py:468-513`.

    `args` is any object with the reference's attribute names (channel,
    N, structure_channel, texture_channel, image_size, channel_multiplier,
    blur_kernel) — see `ideas_tpu.config.TrainConfig`.
    """
    dtype = getattr(args, "compute_dtype", jnp.float32)
    if name == "DisentanglementEncoder":
        return DisentanglementEncoder(
            channel=args.channel,
            structure_channel=args.structure_channel,
            texture_channel=args.texture_channel,
            blur_kernel=tuple(args.blur_kernel),
            dtype=dtype,
        )
    if name == "Generator":
        return Generator(
            channel=args.channel,
            structure_channel=args.structure_channel,
            texture_channel=args.texture_channel,
            blur_kernel=tuple(args.blur_kernel),
            remat=bool(getattr(args, "remat", False)),
            dtype=dtype,
        )
    if name == "StructureGenerator":
        return StructureGenerator(
            channel=args.channel,
            N=args.N,
            structure_channel=args.structure_channel,
            blur_kernel=tuple(args.blur_kernel),
            dtype=dtype,
        )
    if name == "TensorExtractor":
        return TensorExtractor(
            channel=args.channel,
            N=args.N,
            structure_channel=args.structure_channel,
            blur_kernel=tuple(args.blur_kernel),
            dtype=dtype,
        )
    if name == "ImageLevelDiscriminator":
        return ImageLevelDiscriminator(
            size=args.image_size,
            channel_multiplier=args.channel_multiplier,
            blur_kernel=tuple(args.blur_kernel),
            dtype=dtype,
        )
    if name == "CooccurenceDiscriminator":
        return CooccurenceDiscriminator(
            channel=args.channel,
            size=args.image_size,
            dtype=dtype,
        )
    if name == "DistributionDiscriminator":
        return DistributionDiscriminator(
            texture_channel=args.texture_channel,
            dtype=dtype,
        )
    raise NotImplementedError(name)
