"""NN primitives: equalized-lr layers, modulated convolution, residual blocks."""

from ideas_tpu.nn.layers import (
    EqualConv2d,
    EqualConvTranspose2d,
    EqualLinear,
    ModulatedConv2d,
    StyledConv,
    ConvLayer,
    StyledResBlock,
    ResBlock,
    PixelNorm,
)

__all__ = [
    "EqualConv2d",
    "EqualConvTranspose2d",
    "EqualLinear",
    "ModulatedConv2d",
    "StyledConv",
    "ConvLayer",
    "StyledResBlock",
    "ResBlock",
    "PixelNorm",
]
