"""TPU-native fused ops.

The reference implements two custom CUDA ops (`stylegan2/op/upfirdn2d_kernel.cu`,
`stylegan2/op/fused_bias_act_kernel.cu`). Here they are rebuilt TPU-first:
a pure-XLA formulation (which XLA fuses aggressively on its own) plus fused
Pallas kernels for the hot configurations, behind the same public API.
"""

from ideas_tpu.ops.upfirdn2d import upfirdn2d, make_kernel, blur, upsample2x, downsample2x
from ideas_tpu.ops.fused_act import fused_leaky_relu, scaled_leaky_relu

__all__ = [
    "upfirdn2d",
    "make_kernel",
    "blur",
    "upsample2x",
    "downsample2x",
    "fused_leaky_relu",
    "scaled_leaky_relu",
]
