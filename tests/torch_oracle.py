"""Test-only torch oracle of the reference network forward semantics.

Minimal torch modules with the same parameter/buffer STRUCTURE and
forward math as the reference nets (each class cites its source), so
converted state_dicts can be verified NUMERICALLY against the flax
models — the role of `/root/reference/stylegan2/convert_weight.py:243-278`,
which runs both frameworks on the same input and compares outputs.

These are deliberately independent re-implementations of the documented
math (equalized lr, upfirdn2d FIR blur, modulated conv), not copies:
convs run per-sample instead of the reference's grouped-conv trick, and
the upfirdn blur is a pad + depthwise correlation. What torch *itself*
provides is the nn.Sequential/state_dict key naming — so the converter's
Sequential index arithmetic is checked against torch's real naming
rather than a re-derivation of it.
"""

import math

import torch
from torch import nn
import torch.nn.functional as F


def _make_kernel(taps):
    k = torch.tensor(taps, dtype=torch.float32)
    k2 = k[None, :] * k[:, None]
    return k2 / k2.sum()


class Blur(nn.Module):
    """upfirdn2d(x, k, up=1, down=1, pad) — `stylegan2/model.py:75-90`:
    pad, then correlate each channel with the flipped 2-D FIR kernel."""

    def __init__(self, taps, pad, upsample_factor=1):
        super().__init__()
        k = _make_kernel(taps)
        if upsample_factor > 1:
            k = k * (upsample_factor ** 2)
        self.register_buffer("kernel", k)
        self.pad = pad

    def forward(self, x):
        p0, p1 = self.pad
        x = F.pad(x, (p0, p1, p0, p1))
        c = x.shape[1]
        w = torch.flip(self.kernel, (0, 1))[None, None].repeat(c, 1, 1, 1)
        return F.conv2d(x, w, groups=c)


class FusedLeakyReLU(nn.Module):
    """bias + leaky_relu(0.2) * sqrt(2) — `stylegan2/op/fused_act.py`."""

    def __init__(self, channel):
        super().__init__()
        self.bias = nn.Parameter(torch.zeros(channel))

    def forward(self, x):
        b = self.bias.view(1, -1, *([1] * (x.ndim - 2)))
        return F.leaky_relu(x + b, 0.2) * math.sqrt(2)


class ScaledLeakyReLU(nn.Module):
    """leaky_relu(0.2) * sqrt(2) — `stylegan2/model.py:169-178`."""

    def forward(self, x):
        return F.leaky_relu(x, 0.2) * math.sqrt(2)


class EqualConv2d(nn.Module):
    """Runtime-He-scaled conv — `stylegan2/model.py:94-129`."""

    def __init__(self, in_ch, out_ch, k, stride=1, padding=0, bias=True):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(out_ch, in_ch, k, k))
        self.scale = 1.0 / math.sqrt(in_ch * k ** 2)
        self.stride, self.padding = stride, padding
        self.bias = nn.Parameter(torch.zeros(out_ch)) if bias else None

    def forward(self, x):
        return F.conv2d(x, self.weight * self.scale, self.bias,
                        stride=self.stride, padding=self.padding)


class EqualConvTranspose2d(nn.Module):
    """`models.py:11-46` (weight IOHW, scale by in-channel fan-in)."""

    def __init__(self, in_ch, out_ch, k, stride=2, padding=0, bias=True):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(in_ch, out_ch, k, k))
        self.scale = 1.0 / math.sqrt(in_ch * k ** 2)
        self.stride, self.padding = stride, padding
        self.bias = nn.Parameter(torch.zeros(out_ch)) if bias else None

    def forward(self, x):
        return F.conv_transpose2d(x, self.weight * self.scale, self.bias,
                                  stride=self.stride, padding=self.padding)


class EqualLinear(nn.Module):
    """`stylegan2/model.py:132-166`."""

    def __init__(self, in_dim, out_dim, bias=True, bias_init=0.0,
                 lr_mul=1.0, activation=None):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(out_dim, in_dim) / lr_mul)
        self.bias = (nn.Parameter(torch.full((out_dim,), float(bias_init)))
                     if bias else None)
        self.activation = activation
        self.scale = (1.0 / math.sqrt(in_dim)) * lr_mul
        self.lr_mul = lr_mul

    def forward(self, x):
        if self.activation:
            y = F.linear(x, self.weight * self.scale)
            return F.leaky_relu(y + self.bias * self.lr_mul, 0.2) * math.sqrt(2)
        return F.linear(x, self.weight * self.scale,
                        self.bias * self.lr_mul if self.bias is not None else None)


class ConvLayer(nn.Sequential):
    """`models.py:49-134`: [Blur?] / [ReflectionPad?] / conv(T) / [Blur?]
    / (Tanh | FusedLeakyReLU | ScaledLeakyReLU)?  — real nn.Sequential,
    so state_dict indices come from torch, not from us."""

    def __init__(self, in_ch, out_ch, k, upsample=False, downsample=False,
                 blur_kernel=(1, 3, 3, 1), bias=True, activate=True,
                 padding="zero", tanh=False):
        layers = []
        pad, stride = 0, 1
        if downsample:
            p = (len(blur_kernel) - 2) + (k - 1)
            layers.append(Blur(blur_kernel, pad=((p + 1) // 2, p // 2)))
            stride = 2
        if upsample:
            layers.append(EqualConvTranspose2d(in_ch, out_ch, k, stride=2,
                                               padding=0,
                                               bias=bias and not activate))
            p = (len(blur_kernel) - 2) - (k - 1)
            layers.append(Blur(blur_kernel,
                               pad=((p + 1) // 2 + 1, p // 2 + 1)))
        else:
            if not downsample:
                if padding == "zero":
                    pad = (k - 1) // 2
                elif padding == "reflect":
                    if (k - 1) // 2 > 0:
                        layers.append(nn.ReflectionPad2d((k - 1) // 2))
                elif padding != "valid":
                    raise ValueError(padding)
            layers.append(EqualConv2d(in_ch, out_ch, k, stride=stride,
                                      padding=pad,
                                      bias=bias and not activate))
        if activate:
            if tanh:
                layers.append(nn.Tanh())
            elif bias:
                layers.append(FusedLeakyReLU(out_ch))
            else:
                layers.append(ScaledLeakyReLU())
        super().__init__(*layers)


class ModulatedConv2d(nn.Module):
    """`stylegan2/model.py:181-277`, per-sample convs instead of the
    grouped-conv batch trick (same math)."""

    def __init__(self, in_ch, out_ch, k, style_dim, demodulate=True,
                 upsample=False, blur_kernel=(1, 3, 3, 1)):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(1, out_ch, in_ch, k, k))
        self.modulation = EqualLinear(style_dim, in_ch, bias_init=1.0)
        self.scale = 1.0 / math.sqrt(in_ch * k ** 2)
        self.k, self.demodulate, self.upsample = k, demodulate, upsample
        if upsample:
            p = (len(blur_kernel) - 2) - (k - 1)
            self.blur = Blur(blur_kernel,
                             pad=((p + 1) // 2 + 1, p // 2 + 1),
                             upsample_factor=2)

    def forward(self, x, style):
        b = x.shape[0]
        s = self.modulation(style)  # (B, in)
        w = self.scale * self.weight * s.view(b, 1, -1, 1, 1)  # (B,O,I,k,k)
        if self.demodulate:
            d = torch.rsqrt(w.pow(2).sum((2, 3, 4)) + 1e-8)
            w = w * d.view(b, -1, 1, 1, 1)
        outs = []
        for i in range(b):
            if self.upsample:
                outs.append(F.conv_transpose2d(x[i:i + 1],
                                               w[i].transpose(0, 1),
                                               stride=2, padding=0))
            else:
                outs.append(F.conv2d(x[i:i + 1], w[i], padding=self.k // 2))
        y = torch.cat(outs)
        return self.blur(y) if self.upsample else y


class StyledConv(nn.Module):
    """StyledConv_without_noise — `stylegan2/model.py:343-377`."""

    def __init__(self, in_ch, out_ch, k, style_dim, upsample=False,
                 blur_kernel=(1, 3, 3, 1)):
        super().__init__()
        self.conv = ModulatedConv2d(in_ch, out_ch, k, style_dim,
                                    upsample=upsample, blur_kernel=blur_kernel)
        self.activate = FusedLeakyReLU(out_ch)

    def forward(self, x, style):
        return self.activate(self.conv(x, style))


class StyledResBlock(nn.Module):
    """`models.py:137-178`."""

    def __init__(self, in_ch, out_ch, style_dim, upsample,
                 blur_kernel=(1, 3, 3, 1)):
        super().__init__()
        self.conv1 = StyledConv(in_ch, out_ch, 3, style_dim,
                                upsample=upsample, blur_kernel=blur_kernel)
        self.conv2 = StyledConv(out_ch, out_ch, 3, style_dim)
        self.skip = (ConvLayer(in_ch, out_ch, 1, upsample=upsample,
                               blur_kernel=blur_kernel, bias=False,
                               activate=False)
                     if upsample or in_ch != out_ch else None)

    def forward(self, x, style):
        y = self.conv2(self.conv1(x, style), style)
        skip = self.skip(x) if self.skip is not None else x
        return (y + skip) / math.sqrt(2)


class ResBlock(nn.Module):
    """`models.py:181-227`."""

    def __init__(self, in_ch, out_ch, downsample, padding="zero",
                 blur_kernel=(1, 3, 3, 1)):
        super().__init__()
        self.conv1 = ConvLayer(in_ch, out_ch, 3, padding=padding)
        self.conv2 = ConvLayer(out_ch, out_ch, 3, downsample=downsample,
                               padding=padding, blur_kernel=blur_kernel)
        self.skip = (ConvLayer(in_ch, out_ch, 1, downsample=downsample,
                               blur_kernel=blur_kernel, bias=False,
                               activate=False)
                     if downsample or in_ch != out_ch else None)

    def forward(self, x):
        y = self.conv2(self.conv1(x))
        skip = self.skip(x) if self.skip is not None else x
        return (y + skip) / math.sqrt(2)


class DisentanglementEncoder(nn.Module):
    """`models.py:230-268`."""

    def __init__(self, channel, structure_channel=8, texture_channel=2048):
        super().__init__()
        stem = [ConvLayer(3, channel, 1)]
        in_ch = channel
        for i in range(1, 5):
            stem.append(ResBlock(in_ch, channel * 2 ** i, downsample=True,
                                 padding="reflect"))
            in_ch = channel * 2 ** i
        self.stem = nn.Sequential(*stem)
        self.structure = nn.Sequential(
            ConvLayer(in_ch, in_ch, 1),
            ConvLayer(in_ch, structure_channel, 1),
        )
        self.texture = nn.Sequential(
            ConvLayer(in_ch, in_ch * 2, 3, downsample=True, padding="valid"),
            ConvLayer(in_ch * 2, in_ch * 4, 3, downsample=True, padding="valid"),
            nn.AdaptiveAvgPool2d(1),
            ConvLayer(in_ch * 4, texture_channel, 1, tanh=True),
        )

    def forward(self, x):
        h = self.stem(x)
        return self.structure(h), torch.flatten(self.texture(h), 1)


class Generator(nn.Module):
    """`models.py:271-306`."""

    def __init__(self, channel, structure_channel=8, texture_channel=2048):
        super().__init__()
        muls = (4, 8, 12, 16, 16, 16, 8, 4)
        ups = (False, False, False, False, True, True, True, True)
        self.layers = nn.ModuleList()
        in_ch = structure_channel
        for m, up in zip(muls, ups):
            self.layers.append(
                StyledResBlock(in_ch, channel * m, texture_channel, up))
            in_ch = channel * m
        self.to_rgb = ConvLayer(in_ch, 3, 1, activate=False)

    def forward(self, structure, texture):
        h = structure
        for layer in self.layers:
            h = layer(h, texture)
        return self.to_rgb(h)


class StructureGenerator(nn.Module):
    """`models.py:309-329`."""

    def __init__(self, channel, N=1, structure_channel=8):
        super().__init__()
        self.structure = nn.Sequential(
            ConvLayer(N, channel, 1),
            ResBlock(channel, channel * 2, downsample=False, padding="reflect"),
            ResBlock(channel * 2, channel * 4, downsample=False, padding="reflect"),
            ResBlock(channel * 4, channel * 2, downsample=False, padding="reflect"),
            ConvLayer(channel * 2, structure_channel, 1),
        )

    def forward(self, z):
        return self.structure(z)


class TensorExtractor(nn.Module):
    """`models.py:444-465`."""

    def __init__(self, channel, N=1, structure_channel=8):
        super().__init__()
        self.extract = nn.Sequential(
            ConvLayer(structure_channel, channel * 2, 1),
            ResBlock(channel * 2, channel * 4, downsample=False, padding="reflect"),
            ResBlock(channel * 4, channel * 2, downsample=False, padding="reflect"),
            ResBlock(channel * 2, channel, downsample=False, padding="reflect"),
            ConvLayer(channel, N, 1),
        )

    def forward(self, s):
        return self.extract(s)


_D_CHANNELS = {4: 512, 8: 512, 16: 512, 32: 512, 64: 256, 128: 128,
               256: 64, 512: 32, 1024: 16}


class ImageLevelDiscriminator(nn.Module):
    """`models.py:332-376` (channel_multiplier=1). NOTE the NCHW
    channel-major flatten before final_linear — the layout detail the
    converter must permute for NHWC."""

    def __init__(self, size):
        super().__init__()
        ch = dict(_D_CHANNELS)
        convs = [ConvLayer(3, ch[size], 1)]
        in_ch = ch[size]
        for i in range(int(math.log2(size)), 2, -1):
            convs.append(ResBlock(in_ch, ch[2 ** (i - 1)], downsample=True))
            in_ch = ch[2 ** (i - 1)]
        self.convs = nn.Sequential(*convs)
        self.final_conv = ConvLayer(in_ch, ch[4], 3)
        self.final_linear = nn.Sequential(
            EqualLinear(ch[4] * 4 * 4, ch[4], activation="fused_lrelu"),
            EqualLinear(ch[4], 1),
        )

    def forward(self, x):
        h = self.final_conv(self.convs(x))
        return self.final_linear(h.view(h.shape[0], -1))


class CooccurenceDiscriminator(nn.Module):
    """`models.py:379-426`."""

    def __init__(self, channel, size=256):
        super().__init__()
        encoder = [ConvLayer(3, channel, 1)]
        in_ch = channel
        for mul, down in zip((2, 4, 8, 12, 12, 24),
                             (True, True, True, True, True, False)):
            encoder.append(ResBlock(in_ch, channel * mul, down))
            in_ch = channel * mul
        if size > 511:
            k_size, feat_size = 3, 4
        else:
            k_size, feat_size = 2, 1
        encoder.append(ConvLayer(in_ch, channel * 12, k_size, padding="valid"))
        self.encoder = nn.Sequential(*encoder)
        self.linear = nn.Sequential(
            EqualLinear(channel * 12 * 2 * feat_size, channel * 32,
                        activation="fused_lrelu"),
            EqualLinear(channel * 32, channel * 32, activation="fused_lrelu"),
            EqualLinear(channel * 32, channel * 16, activation="fused_lrelu"),
            EqualLinear(channel * 16, 1),
        )

    def forward(self, x, reference, ref_batch):
        feat = self.encoder(x)
        ref = self.encoder(reference)
        _, c, h, w = ref.shape
        ref = ref.view(-1, ref_batch, c, h, w).mean(1)
        out = torch.flatten(torch.cat((feat, ref), 1), 1)
        return self.linear(out)


class DistributionDiscriminator(nn.Module):
    """`models.py:429-441`."""

    def __init__(self, texture_channel=2048):
        super().__init__()
        tc = texture_channel
        self.model = nn.Sequential(
            EqualLinear(tc, tc // 4, activation="fused_lrelu"),
            EqualLinear(tc // 4, tc // 16, activation="fused_lrelu"),
            EqualLinear(tc // 16, tc // 64, activation="fused_lrelu"),
            EqualLinear(tc // 64, 1, activation="fused_lrelu"),
        )

    def forward(self, t):
        return self.model(t)
