"""Numerical converter parity against a torch oracle.

The reference proves its weight converter by running both frameworks on
identical inputs and comparing outputs
(`/root/reference/stylegan2/convert_weight.py:243-278`). Same here: build
each reference net as a torch module (tests/torch_oracle.py — reference
structure + math, torch-authentic state_dict naming), randomize its
parameters, convert the state_dict with `tools/convert_torch_ckpt`, and
assert the flax forward equals the torch forward.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from ideas_tpu.config import TrainConfig
from ideas_tpu.models import init_model
from ideas_tpu.nn.layers import ConvLayer as FlaxConvLayer
from ideas_tpu.nn.layers import StyledResBlock as FlaxStyledResBlock
from ideas_tpu.tools import convert_torch_ckpt as cc
from tests import torch_oracle as oracle


def _randomize(mod, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in mod.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.5)
    return mod


def _sd(mod, prefix=""):
    return {f"{prefix}{k}": v.detach().numpy() for k, v in mod.state_dict().items()}


def _nhwc(t):
    return jnp.asarray(np.transpose(t.detach().numpy(), (0, 2, 3, 1)))


def _assert_close(flax_out, torch_out_nchw, tol=2e-4):
    want = np.transpose(torch_out_nchw.detach().numpy(), (0, 2, 3, 1)) \
        if torch_out_nchw.ndim == 4 else torch_out_nchw.detach().numpy()
    np.testing.assert_allclose(np.asarray(flax_out), want, rtol=tol, atol=tol)


CONV_LAYER_VARIANTS = [
    # (kernel, dict(flags)) — every composition path of models.py:49-134
    dict(k=3, padding="zero"),
    dict(k=3, padding="reflect"),
    dict(k=2, padding="valid"),
    dict(k=1, padding="zero", tanh=True),
    dict(k=3, downsample=True),
    dict(k=1, upsample=True, bias=False, activate=False),  # StyledResBlock skip
    dict(k=1, downsample=True, bias=False, activate=False),  # ResBlock skip
    dict(k=1, bias=True, activate=False),  # to_rgb
    dict(k=3, bias=False, activate=True),  # ScaledLeakyReLU tail
]


@pytest.mark.parametrize("variant", CONV_LAYER_VARIANTS,
                         ids=[str(i) for i in range(len(CONV_LAYER_VARIANTS))])
def test_conv_layer_variants(variant):
    v = {**dict(padding="zero", upsample=False, downsample=False, bias=True,
                activate=True, tanh=False), **variant}
    k = v.pop("k")
    in_ch, out_ch = 6, 8
    tm = _randomize(oracle.ConvLayer(in_ch, out_ch, k, **v), seed=k * 31)
    holder = torch.nn.Module()
    holder.L = tm

    x = torch.randn(2, in_ch, 16, 16, generator=torch.Generator().manual_seed(7))
    with torch.no_grad():
        want = tm(x)

    conv = cc._conv_layer(
        _sd(holder), "L",
        pad_module=(v["padding"] == "reflect" and k > 1),
        has_blur=v["downsample"],
        upsample=v["upsample"],
        activate_bias=(v["activate"] and v["bias"] and not v["tanh"]),
        conv_bias=(v["bias"] and not v["activate"]),
    )
    fm = FlaxConvLayer(out_ch, k, upsample=v["upsample"],
                       downsample=v["downsample"], use_bias=v["bias"],
                       activate=v["activate"], padding=v["padding"],
                       tanh=v["tanh"])
    got = fm.apply({"params": conv}, _nhwc(x))
    _assert_close(got, want)


@pytest.mark.parametrize("upsample,in_ch,out_ch",
                         [(False, 8, 8), (False, 8, 12), (True, 8, 12)])
def test_styled_res_block(upsample, in_ch, out_ch):
    style_dim = 16
    tm = _randomize(oracle.StyledResBlock(in_ch, out_ch, style_dim, upsample),
                    seed=11)
    holder = torch.nn.Module()
    holder.B = tm
    sd = _sd(holder)

    g = torch.Generator().manual_seed(3)
    x = torch.randn(2, in_ch, 8, 8, generator=g)
    s = torch.randn(2, style_dim, generator=g)
    with torch.no_grad():
        want = tm(x, s)

    conv = {"conv1": cc._styled_conv(sd, "B.conv1"),
            "conv2": cc._styled_conv(sd, "B.conv2")}
    if any(key.startswith("B.skip.") for key in sd):
        conv["skip"] = cc._conv_layer(sd, "B.skip", pad_module=False,
                                      has_blur=False, upsample=upsample,
                                      activate_bias=False)
    fm = FlaxStyledResBlock(out_ch, upsample=upsample)
    got = fm.apply({"params": conv}, _nhwc(x), jnp.asarray(s.numpy()))
    _assert_close(got, want)


CFG = TrainConfig(image_size=64, channel=4, N=1, texture_channel=64,
                  structure_channel=8)


def _full_model_case(name):
    g = torch.Generator().manual_seed(101)
    res = CFG.image_size // 16
    if name == "E":
        tm = oracle.DisentanglementEncoder(CFG.channel, CFG.structure_channel,
                                           CFG.texture_channel)
        args = (torch.randn(2, 3, CFG.image_size, CFG.image_size, generator=g),)
        return tm, cc.convert_encoder, "DisentanglementEncoder", args
    if name == "G":
        tm = oracle.Generator(CFG.channel, CFG.structure_channel,
                              CFG.texture_channel)
        args = (torch.randn(2, CFG.structure_channel, res, res, generator=g),
                torch.randn(2, CFG.texture_channel, generator=g))
        return tm, cc.convert_generator, "Generator", args
    if name == "Gstru":
        tm = oracle.StructureGenerator(CFG.channel, CFG.N, CFG.structure_channel)
        args = (torch.randn(2, CFG.N, res, res, generator=g),)
        return tm, cc.convert_structure_generator, "StructureGenerator", args
    if name == "Ex":
        tm = oracle.TensorExtractor(CFG.channel, CFG.N, CFG.structure_channel)
        args = (torch.randn(2, CFG.structure_channel, res, res, generator=g),)
        return tm, cc.convert_extractor, "TensorExtractor", args
    if name == "Dreal":
        tm = oracle.ImageLevelDiscriminator(CFG.image_size)
        conv = lambda sd: cc.convert_dreal(
            sd, int(math.log2(CFG.image_size)) - 2)
        args = (torch.randn(1, 3, CFG.image_size, CFG.image_size, generator=g),)
        return tm, conv, "ImageLevelDiscriminator", args
    if name == "Ddist":
        tm = oracle.DistributionDiscriminator(CFG.texture_channel)
        args = (torch.randn(2, CFG.texture_channel, generator=g),)
        return tm, cc.convert_ddist, "DistributionDiscriminator", args
    raise KeyError(name)


@pytest.mark.parametrize("name", ["E", "G", "Gstru", "Ex", "Dreal", "Ddist"])
def test_full_model_parity(name):
    import zlib

    tm, convert, flax_name, args = _full_model_case(name)
    # crc32, not hash(): PYTHONHASHSEED varies per process and would make
    # the randomized weights — and any failure — unreproducible.
    _randomize(tm, seed=zlib.crc32(name.encode()))
    with torch.no_grad():
        want = tm(*args)
    params = convert(_sd(tm))
    fm = init_model(flax_name, CFG)
    jargs = tuple(_nhwc(a) if a.ndim == 4 else jnp.asarray(a.numpy())
                  for a in args)
    got = jax.jit(lambda *a: fm.apply({"params": params}, *a))(*jargs)
    if isinstance(want, tuple):
        for gg, ww in zip(got, want):
            _assert_close(gg, ww, tol=5e-4)
    else:
        _assert_close(got, want, tol=5e-4)


def test_dco_parity():
    """Dco — the net the round-1 --check omitted — at the paper 256^2
    geometry (64^2 patches, 5 downsampling ResBlocks, 1x1 head)."""
    tm = _randomize(oracle.CooccurenceDiscriminator(channel=4, size=256),
                    seed=42)
    g = torch.Generator().manual_seed(5)
    x = torch.randn(2, 3, 64, 64, generator=g)
    ref = torch.randn(4, 3, 64, 64, generator=g)
    with torch.no_grad():
        want = tm(x, ref, ref_batch=2)
    params = cc.convert_dco(_sd(tm))
    cfg = TrainConfig(image_size=256, channel=4, N=1, texture_channel=64,
                      structure_channel=8)
    fm = init_model("CooccurenceDiscriminator", cfg)
    got, _ = jax.jit(
        lambda a, r: fm.apply({"params": params}, a, r, ref_batch=2)
    )(_nhwc(x), _nhwc(ref))
    _assert_close(got, want, tol=5e-4)


def test_inception_port_and_weight_loader(tmp_path):
    """FID-Inception port vs a torch oracle with torchvision state_dict
    naming: proves the flax topology (BN eval mode, TF-style avg pools,
    the E2 max-pool patch) AND load_params_npz's name/layout mapping —
    so when the real pt_inception .pth arrives, the conversion path is
    already verified (SURVEY §4(f))."""
    from ideas_tpu.eval.inception import InceptionV3Features, load_params_npz
    from tests.torch_inception import FIDInceptionV3

    tm = FIDInceptionV3().eval()
    g = torch.Generator().manual_seed(3)
    with torch.no_grad():
        for name, p in tm.named_parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)
        for name, b in tm.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=g) * 0.1)
            elif name.endswith("running_var"):
                b.copy_(torch.rand(b.shape, generator=g) + 0.5)

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    npz = tmp_path / "incep.npz"
    np.savez(npz, **sd)
    params = load_params_npz(str(npz))

    x = torch.randn(2, 3, 75, 75, generator=g)
    with torch.no_grad():
        want = tm(x).numpy()
    model = InceptionV3Features(resize_input=False)
    got = np.asarray(jax.jit(model.apply)(
        params, jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


class _TorchVGGFeatures(torch.nn.Module):
    """torchvision-vgg16 `features` layout (Sequential indices 0..30) so
    state_dict keys match what `load_weights_npz` expects."""

    def __init__(self):
        super().__init__()
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M"]
        layers, in_c = [], 3
        for v in cfg:
            if v == "M":
                layers.append(torch.nn.MaxPool2d(2, 2))
            else:
                layers += [torch.nn.Conv2d(in_c, v, 3, padding=1),
                           torch.nn.ReLU()]
                in_c = v
        self.features = torch.nn.Sequential(*layers)

    def forward(self, x):
        taps = {3, 8, 15, 22, 29}  # relu1_2..relu5_3
        feats = []
        for i, m in enumerate(self.features):
            x = m(x)
            if i in taps:
                feats.append(x)
        return feats


def test_lpips_port_and_loader(tmp_path):
    """LPIPS vgg port vs a torch oracle (reference net-lin math,
    `lpips/networks_basic.py:42-124`) using the REAL packaged lin-head
    weights on both sides — proves the flax backbone taps, the
    normalize/lin/average pipeline, and load_weights_npz's layout
    mapping for a torchvision-format backbone npz."""
    from ideas_tpu.eval.lpips import LPIPS, load_weights_npz, packaged_linear_path

    tvgg = _TorchVGGFeatures().eval()
    g = torch.Generator().manual_seed(9)
    with torch.no_grad():
        for p in tvgg.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    sd = {k: v.detach().numpy() for k, v in tvgg.state_dict().items()}
    backbone_npz = tmp_path / "vgg16.npz"
    np.savez(backbone_npz, **sd)

    lins = {k: torch.tensor(v) for k, v in
            dict(np.load(packaged_linear_path("vgg"))).items()}

    shift = torch.tensor([-.030, -.088, -.188])[None, :, None, None]
    scale = torch.tensor([.458, .448, .450])[None, :, None, None]

    def torch_lpips(x, y):
        fx = tvgg((x - shift) / scale)
        fy = tvgg((y - shift) / scale)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            na = a / (a.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            nb = b / (b.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            d = (na - nb) ** 2
            w = lins[f"lin{i}.model.1.weight"]
            total = total + torch.nn.functional.conv2d(d, w).mean((1, 2, 3))
        return total

    x = torch.rand(2, 3, 64, 64, generator=g) * 2 - 1
    y = torch.rand(2, 3, 64, 64, generator=g) * 2 - 1
    with torch.no_grad():
        want = torch_lpips(x, y).numpy()

    params = load_weights_npz("vgg", str(backbone_npz),
                              packaged_linear_path("vgg"))
    got = np.asarray(jax.jit(LPIPS(net="vgg").apply)(
        params, _nhwc(x), _nhwc(y)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_lpips_squeeze_port_and_loader(tmp_path):
    """Squeeze LPIPS variant vs a torch oracle that replicates
    torchvision's squeezenet1_1 `.features` (random weights — Fire
    modules and ceil-mode pooling included, state_dict keys in the
    torchvision layout) with the REAL packaged squeeze lin heads on both
    sides. The third net-lin variant the reference vendors
    (`lpips/pretrained_networks.py:6-54`, `weights/v0.1/squeeze.pth`)."""
    from ideas_tpu.eval.lpips import LPIPS, load_weights_npz, packaged_linear_path

    class _Fire(torch.nn.Module):
        def __init__(self, cin, s1, e1, e3):
            super().__init__()
            self.squeeze = torch.nn.Conv2d(cin, s1, 1)
            self.expand1x1 = torch.nn.Conv2d(s1, e1, 1)
            self.expand3x3 = torch.nn.Conv2d(s1, e3, 3, padding=1)

        def forward(self, x):
            s = torch.relu(self.squeeze(x))
            return torch.cat(
                [torch.relu(self.expand1x1(s)),
                 torch.relu(self.expand3x3(s))], 1)

    tnet = torch.nn.Sequential(
        torch.nn.Conv2d(3, 64, 3, stride=2),       # 0
        torch.nn.ReLU(),                            # 1
        torch.nn.MaxPool2d(3, 2, ceil_mode=True),   # 2
        _Fire(64, 16, 64, 64),                      # 3
        _Fire(128, 16, 64, 64),                     # 4
        torch.nn.MaxPool2d(3, 2, ceil_mode=True),   # 5
        _Fire(128, 32, 128, 128),                   # 6
        _Fire(256, 32, 128, 128),                   # 7
        torch.nn.MaxPool2d(3, 2, ceil_mode=True),   # 8
        _Fire(256, 48, 192, 192),                   # 9
        _Fire(384, 48, 192, 192),                   # 10
        _Fire(384, 64, 256, 256),                   # 11
        _Fire(512, 64, 256, 256),                   # 12
    ).eval()
    g = torch.Generator().manual_seed(11)
    with torch.no_grad():
        for p in tnet.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    sd = {f"features.{k}": v.detach().numpy()
          for k, v in tnet.state_dict().items()}
    backbone_npz = tmp_path / "squeezenet1_1.npz"
    np.savez(backbone_npz, **sd)

    lins = {k: torch.tensor(v) for k, v in
            dict(np.load(packaged_linear_path("squeeze"))).items()}
    shift = torch.tensor([-.030, -.088, -.188])[None, :, None, None]
    scale = torch.tensor([.458, .448, .450])[None, :, None, None]
    taps = {1, 4, 7, 9, 10, 11, 12}  # pretrained_networks.py:18-31

    def tfeats(x):
        feats = []
        for i, m in enumerate(tnet):
            x = m(x)
            if i in taps:
                feats.append(x)
        return feats

    def torch_lpips(x, y):
        fx = tfeats((x - shift) / scale)
        fy = tfeats((y - shift) / scale)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            na = a / (a.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            nb = b / (b.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            d = (na - nb) ** 2
            w = lins[f"lin{i}.model.1.weight"]
            total = total + torch.nn.functional.conv2d(d, w).mean((1, 2, 3))
        return total

    x = torch.rand(2, 3, 64, 64, generator=g) * 2 - 1
    y = torch.rand(2, 3, 64, 64, generator=g) * 2 - 1
    with torch.no_grad():
        want = torch_lpips(x, y).numpy()

    params = load_weights_npz("squeeze", str(backbone_npz),
                              packaged_linear_path("squeeze"))
    got = np.asarray(jax.jit(LPIPS(net="squeeze").apply)(
        params, _nhwc(x), _nhwc(y)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
