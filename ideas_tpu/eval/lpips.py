"""LPIPS perceptual distance (the vendored net-lin model of
`/root/reference/stylegan2/lpips/`): pretrained backbone features,
unit-normalize per channel, squared difference, learned 1x1 linear heads,
spatial average, summed over layers (`networks_basic.py:27-92`).

Backbones: VGG16 and AlexNet feature stacks are defined here in flax;
weights load from converted .npz files. The official net-lin LINEAR-HEAD
weights (the reference vendors them,
`/root/reference/stylegan2/lpips/weights/v0.1/{vgg,alex}.pth`) are
converted and packaged at `eval/weights/lpips_lin_<net>.npz` —
`load_packaged_linears` merges them over any backbone params. The
BACKBONE weights (torchvision vgg16/alexnet pretrained) are NOT
obtainable in this zero-egress environment; without them the module
runs with a fixed-seed random backbone — deterministic and usable for
relative comparisons, but NOT equal to the paper's LPIPS numbers.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# ImageNet scaling used by LPIPS (lpips/networks_basic.py ScalingLayer).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 conv stack; returns relu1_2..relu5_3 activations."""

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        cfg = [
            (64, 2),   # relu1_2
            (128, 2),  # relu2_2
            (256, 3),  # relu3_3
            (512, 3),  # relu4_3
            (512, 3),  # relu5_3
        ]
        feats = []
        idx = 0
        for block, (ch, n) in enumerate(cfg):
            for i in range(n):
                x = nn.Conv(ch, (3, 3), padding=1, name=f"conv{idx}")(x)
                x = nn.relu(x)
                idx += 1
            feats.append(x)
            if block < len(cfg) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


class AlexNetFeatures(nn.Module):
    """AlexNet conv stack; returns the five relu activations."""

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        feats = []
        x = nn.Conv(64, (11, 11), strides=4, padding=2, name="conv0")(x)
        x = nn.relu(x); feats.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(192, (5, 5), padding=2, name="conv1")(x)
        x = nn.relu(x); feats.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(384, (3, 3), padding=1, name="conv2")(x)
        x = nn.relu(x); feats.append(x)
        x = nn.Conv(256, (3, 3), padding=1, name="conv3")(x)
        x = nn.relu(x); feats.append(x)
        x = nn.Conv(256, (3, 3), padding=1, name="conv4")(x)
        x = nn.relu(x); feats.append(x)
        return feats


class Fire(nn.Module):
    """SqueezeNet Fire: 1x1 squeeze -> relu -> parallel 1x1/3x3 expands
    -> relu -> channel concat."""

    s1: int
    e1: int
    e3: int

    @nn.compact
    def __call__(self, x):
        s = nn.relu(nn.Conv(self.s1, (1, 1), name="squeeze")(x))
        a = nn.relu(nn.Conv(self.e1, (1, 1), name="expand1x1")(s))
        b = nn.relu(nn.Conv(self.e3, (3, 3), padding=1, name="expand3x3")(s))
        return jnp.concatenate([a, b], axis=-1)


class SqueezeNetFeatures(nn.Module):
    """SqueezeNet 1.1 feature stack; returns the 7 tap activations of
    the reference's squeeze LPIPS variant
    (`lpips/pretrained_networks.py:6-54`: taps after torchvision
    `.features` indices 1, 4, 7, 9, 10, 11, 12). Pooling here is
    floor-mode; torchvision uses MaxPool(3, 2, ceil_mode=True), which is
    numerically identical for even input sizes (the stride-2 stem conv
    then makes every pool input odd, where ceil == floor) — LPIPS inputs
    in this stack are even-sized."""

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        feats = []
        x = nn.relu(nn.Conv(64, (3, 3), strides=2, padding=0, name="conv0")(x))
        feats.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = Fire(16, 64, 64, name="fire3")(x)
        x = Fire(16, 64, 64, name="fire4")(x)
        feats.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = Fire(32, 128, 128, name="fire6")(x)
        x = Fire(32, 128, 128, name="fire7")(x)
        feats.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = Fire(48, 192, 192, name="fire9")(x)
        feats.append(x)
        x = Fire(48, 192, 192, name="fire10")(x)
        feats.append(x)
        x = Fire(64, 256, 256, name="fire11")(x)
        feats.append(x)
        x = Fire(64, 256, 256, name="fire12")(x)
        feats.append(x)
        return feats


_CHANNELS = {
    "vgg": (64, 128, 256, 512, 512),
    "alex": (64, 192, 384, 256, 256),
    "squeeze": (64, 128, 256, 384, 384, 512, 512),
}


class LPIPS(nn.Module):
    """net-lin LPIPS: d(x, y) = sum_l mean_hw w_l . (nx_l - ny_l)^2."""

    net: str = "vgg"

    def setup(self):
        if self.net == "vgg":
            self.backbone = VGG16Features(name="backbone")
        elif self.net == "alex":
            self.backbone = AlexNetFeatures(name="backbone")
        elif self.net == "squeeze":
            self.backbone = SqueezeNetFeatures(name="backbone")
        else:
            raise ValueError(self.net)
        self.lins = [
            nn.Conv(1, (1, 1), use_bias=False, name=f"lin{i}")
            for i in range(len(_CHANNELS[self.net]))
        ]

    def __call__(self, x, y):
        """x, y: NHWC in [-1, 1]. Returns (B,) distances."""
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        xs = (x - shift) / scale
        ys = (y - shift) / scale
        fx = self.backbone(xs)
        fy = self.backbone(ys)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            na = a * jax.lax.rsqrt(jnp.sum(jnp.square(a), -1, keepdims=True) + 1e-10)
            nb = b * jax.lax.rsqrt(jnp.sum(jnp.square(b), -1, keepdims=True) + 1e-10)
            d = jnp.square(na - nb)
            d = self.lins[i](d)  # learned per-channel weights (>=0 in ckpt)
            total = total + jnp.mean(d, axis=(1, 2, 3))
        return total


def l2_distance(x, y) -> jnp.ndarray:
    """RGB L2 fallback metric (`lpips/networks_basic.py:150-157`):
    per-sample mean squared difference. NHWC, any batch size (the
    reference asserts batch 1; this is the vectorized equivalent)."""
    return jnp.mean(jnp.square(x - y), axis=(1, 2, 3))


def _uniform7(img):
    s = jax.lax.reduce_window(
        img, 0.0, jax.lax.add, (1, 7, 7, 1), (1, 1, 1, 1), "VALID"
    )
    return s / 49.0


def _ssim_mean(x, y, data_range: float) -> jnp.ndarray:
    """Mean SSIM with skimage `compare_ssim` defaults — uniform 7x7
    window, K1=0.01 / K2=0.03, unbiased covariance, per-channel then
    averaged, edges cropped (the VALID window IS skimage's post-crop)."""
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    ux, uy = _uniform7(x), _uniform7(y)
    uxx, uyy = _uniform7(x * x), _uniform7(y * y)
    uxy = _uniform7(x * y)
    cov_norm = 49.0 / 48.0  # unbiased (skimage: NP / (NP - 1))
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    ssim = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux * ux + uy * uy + c1) * (vx + vy + c2)
    )
    return jnp.mean(ssim, axis=(1, 2, 3))


def dssim_distance(x, y) -> jnp.ndarray:
    """DSSIM fallback metric (`lpips/networks_basic.py:167-180`, RGB
    path): (1 - SSIM) / 2. Inputs NHWC in [-1, 1], mapped to the
    reference's 0..255 image range."""
    x = (x + 1.0) * 127.5
    y = (y + 1.0) * 127.5
    return (1.0 - _ssim_mean(x, y, 255.0)) / 2.0


def psnr(x, y, peak: float = 255.0) -> jnp.ndarray:
    """PSNR helper (`lpips/__init__.py:49-50`), per sample. Inputs NHWC
    in [-1, 1]; `peak` matches the reference's 0..255 convention."""
    x = (x + 1.0) * 127.5
    y = (y + 1.0) * 127.5
    mse = jnp.mean(jnp.square(x - y), axis=(1, 2, 3))
    return 10.0 * jnp.log10(peak * peak / mse)


# sRGB -> XYZ (D65) matrix and white point, as used by skimage.color
# (the reference's Lab-colorspace FakeNet metrics route through
# `color.rgb2lab`, `lpips/__init__.py:70-82`).
_RGB2XYZ = np.array(
    [[0.412453, 0.357580, 0.180423],
     [0.212671, 0.715160, 0.072169],
     [0.019334, 0.119193, 0.950227]], np.float32)
_D65 = np.array([0.95047, 1.0, 1.08883], np.float32)


def rgb2lab(rgb) -> jnp.ndarray:
    """CIE Lab from sRGB in [0, 1], NHWC (skimage `color.rgb2lab`
    semantics: linearize, XYZ via the sRGB matrix, D65 white point,
    cube-root transfer with the 6/29 linear toe)."""
    rgb = jnp.asarray(rgb)
    lin = jnp.where(rgb > 0.04045,
                    ((rgb + 0.055) / 1.055) ** 2.4,
                    rgb / 12.92)
    xyz = lin @ jnp.asarray(_RGB2XYZ.T)
    t = xyz / jnp.asarray(_D65)
    eps = (6.0 / 29.0) ** 3
    f = jnp.where(t > eps,
                  jnp.cbrt(t),
                  t / (3 * (6.0 / 29.0) ** 2) + 4.0 / 29.0)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    return jnp.stack(
        [116.0 * fy - 16.0, 500.0 * (fx - fy), 200.0 * (fy - fz)], axis=-1)


def _to_lab(x) -> jnp.ndarray:
    """[-1, 1] NHWC -> Lab through the reference's exact route
    (`lpips/__init__.py:70-82` tensor2tensorlab(to_norm=False)): images
    quantize to uint8 FIRST (tensor2im truncates), then rgb2lab."""
    q = jnp.clip(jnp.floor((x + 1.0) * 127.5), 0.0, 255.0)
    return rgb2lab(q / 255.0)


def l2_lab(x, y) -> jnp.ndarray:
    """Lab-colorspace L2 fallback metric (`networks_basic.py:158-164`
    with `util.l2(..., range=100.)`): 0.5 * mean(((lab0-lab1)/100)^2),
    per sample. Inputs NHWC in [-1, 1]."""
    d = (_to_lab(x) - _to_lab(y)) / 100.0
    return 0.5 * jnp.mean(jnp.square(d), axis=(1, 2, 3))


def dssim_lab(x, y) -> jnp.ndarray:
    """Lab-colorspace DSSIM fallback metric (`networks_basic.py:173-176`
    with `util.dssim(..., range=100.)`). Inputs NHWC in [-1, 1]."""
    return (1.0 - _ssim_mean(_to_lab(x), _to_lab(y), 100.0)) / 2.0


def packaged_linear_path(net: str) -> str:
    """Path of the committed official lin-head weights for `net`."""
    import os

    return os.path.join(os.path.dirname(__file__), "weights",
                        f"lpips_lin_{net}.npz")


def load_packaged_linears(params, net: str):
    """Overwrite the lin-head slots of an LPIPS param tree with the
    official net-lin calibration weights (converted from the .pth files
    the reference vendors). Backbone slots are left untouched."""
    lraw = dict(np.load(packaged_linear_path(net)))
    p = jax.tree.map(lambda a: a, params)  # shallow-ish copy
    inner = p["params"] if "params" in p else p
    for i in range(len(_CHANNELS[net])):
        w = lraw[f"lin{i}.model.1.weight"]  # (1, C, 1, 1) OIHW
        inner[f"lin{i}"] = {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))}
    return p


def fixed_params(net: str, image_size: int = 256):
    """Deterministic LPIPS params: fixed-seed backbone + OFFICIAL lin
    heads. NOT the paper metric (backbone weights unobtainable offline,
    see module docstring) but stable across runs/processes, so relative
    comparisons and PPL/projector trajectories are reproducible."""
    model = LPIPS(net=net)
    x = jnp.zeros((1, image_size, image_size, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)
    return load_packaged_linears(params, net)


def load_weights_npz(net: str, backbone_path: str, linear_path: str):
    """Build LPIPS params from converted torch .npz files.

    backbone npz: 'features.<idx>.weight'/'.bias' (torchvision layout,
    OIHW; squeezenet1_1 additionally nests Fire submodule names, e.g.
    'features.3.squeeze.weight'). linear npz: 'lin<i>.model.1.weight'
    (lpips net-lin layout).
    """
    def oihw_to_hwio(w, b):
        return {"kernel": np.transpose(w, (2, 3, 1, 0)), "bias": b}

    params: Dict[str, Any] = {"backbone": {}, }
    raw = dict(np.load(backbone_path))
    if net == "squeeze":
        params["backbone"]["conv0"] = oihw_to_hwio(
            raw["features.0.weight"], raw["features.0.bias"])
        fire_ids = sorted({int(k.split(".")[1]) for k in raw
                           if k.count(".") == 3})
        for fi in fire_ids:
            params["backbone"][f"fire{fi}"] = {
                sub: oihw_to_hwio(raw[f"features.{fi}.{sub}.weight"],
                                  raw[f"features.{fi}.{sub}.bias"])
                for sub in ("squeeze", "expand1x1", "expand3x3")
            }
    else:
        conv_idx = 0
        # torchvision VGG16/AlexNet conv layer indices in .features
        order = sorted(
            {int(k.split(".")[1]) for k in raw if k.endswith("weight")},
        )
        for li in order:
            params["backbone"][f"conv{conv_idx}"] = oihw_to_hwio(
                raw[f"features.{li}.weight"], raw[f"features.{li}.bias"])
            conv_idx += 1
    lraw = dict(np.load(linear_path))
    for i in range(len(_CHANNELS[net])):
        w = lraw[f"lin{i}.model.1.weight"]  # (1, C, 1, 1)
        params[f"lin{i}"] = {"kernel": np.transpose(w, (2, 3, 1, 0))}
    return {"params": params}
