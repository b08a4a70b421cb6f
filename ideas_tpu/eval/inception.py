"""FID InceptionV3 (pool3 features), flax/NHWC.

Port of the FID-patched InceptionV3 topology used by the reference
(`/root/reference/stylegan2/inception.py`): torchvision InceptionV3 with
the pytorch-fid modifications — InceptionA/C/E avg-pool branches use
count_include_pad=False ("TF-style" average pooling), and the second
InceptionE block replaces its pooling branch with max-pool
(`inception.py:263-310`).

Weights: the reference downloads TF-ported weights (`inception.py:13`);
this environment has no network egress, so `load_params_npz` loads a
converted `.npz` (torch state_dict names -> arrays; produce one with
`python -m ideas_tpu.tools.convert_pretrained inception --pth
pt_inception-2015-12-05-6726825d.pth --out inception.npz` wherever the
.pth is available). Until then `fixed_params` gives a deterministic
fixed-seed feature extractor: *relative* FID trajectories are
reproducible and comparable across checkpoints, but NOT comparable to
the paper's absolute numbers (see PERF.md "FID provenance").
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class BasicConv2d(nn.Module):
    """conv -> batchnorm(eps=1e-3) -> relu."""

    out_channels: int
    kernel_size: Sequence[int]
    strides: int = 1
    padding: Any = 0

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        x = nn.Conv(
            self.out_channels,
            tuple(self.kernel_size),
            strides=(self.strides, self.strides),
            padding=pad,
            use_bias=False,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=1e-3, momentum=0.9, name="bn"
        )(x)
        return nn.relu(x)


def _avg_pool_tf(x, window=3, stride=1, pad=1):
    """Average pooling with count_include_pad=False (the FID patch)."""
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    sum_ = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, window, window, 1), (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )
    return sum_ / cnt


def _max_pool(x, window=3, stride=2, pad=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1), [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = _avg_pool_tf(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=2, name="branch3x3dbl_3")(bd)
        bp = _max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_tf(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=2, name="branch7x7x3_4")(b7)
        bp = _max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    use_max_pool: bool = False  # FID patch: second E block max-pools

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.use_max_pool:
            bp = _max_pool(x, window=3, stride=1, pad=1)
        else:
            bp = _avg_pool_tf(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """Input: NHWC float in [-1, 1], any HxW (resized to 299). Output:
    (B, 2048) pool3 features."""

    resize_input: bool = True

    @nn.compact
    def __call__(self, x):
        if self.resize_input and x.shape[1:3] != (299, 299):
            x = jax.image.resize(
                x, (x.shape[0], 299, 299, x.shape[3]), method="bilinear"
            )
        x = BasicConv2d(32, (3, 3), strides=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = _max_pool(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(use_max_pool=True, name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # global average pool -> (B, 2048)


def fixed_params(image_size: int = 64):
    """Deterministic fixed-seed InceptionV3 params (PRNGKey(0) init).

    The documented fallback while the real FID-Inception weights are
    unobtainable offline: stable across runs and processes, so FID
    trajectories computed with it are self-consistent — but absolute
    values are NOT comparable to the paper. Provenance: PERF.md."""
    model = InceptionV3Features()
    return jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, image_size, image_size, 3))
    )


def load_params_npz(path: str):
    """Load converted torch-fid weights from a .npz into flax params.

    Expected npz keys: torch state_dict names ('Conv2d_1a_3x3.conv.weight',
    'Mixed_5b.branch1x1.bn.running_mean', ...). Conv weights OIHW are
    transposed to HWIO.
    """
    raw = dict(np.load(path))
    params: dict = {}
    batch_stats: dict = {}

    def put(tree, keys, value):
        for k in keys[:-1]:
            tree = tree.setdefault(k, {})
        tree[keys[-1]] = value

    for name, arr in raw.items():
        parts = name.split(".")
        module_path, leaf = parts[:-1], parts[-1]
        if leaf == "weight" and parts[-2] == "conv":
            put(params, module_path + ["kernel"], np.transpose(arr, (2, 3, 1, 0)))
        elif leaf == "weight" and parts[-2] == "bn":
            put(params, module_path + ["scale"], arr)
        elif leaf == "bias" and parts[-2] == "bn":
            put(params, module_path + ["bias"], arr)
        elif leaf == "running_mean":
            put(batch_stats, module_path + ["mean"], arr)
        elif leaf == "running_var":
            put(batch_stats, module_path + ["var"], arr)
    return {"params": params, "batch_stats": batch_stats}
