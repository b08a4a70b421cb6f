"""Convert reference IDEAS PyTorch checkpoints (.pt) into ideas_tpu param
trees — the migration/parity counterpart of the reference's TF->torch
`convert_weight.py` (`/root/reference/stylegan2/convert_weight.py`).

Layout translation:
  torch conv weight        (O, I, kh, kw)    -> HWIO (kh, kw, I, O)
  torch conv_transpose     (I, O, kh, kw)    -> HWIO (kh, kw, I, O)
  torch modulated conv     (1, O, I, kh, kw) -> HWIO (kh, kw, I, O)
  torch linear weight      (out, in)         -> (in, out)
  FusedLeakyReLU bias      (module .1/.2 of a Sequential ConvLayer)
                           -> the wrapping flax layer's top-level 'bias'

Usage:
    python -m ideas_tpu.tools.convert_torch_ckpt --ckpt ref.pt --out conv.npz
then `load_converted(path)` returns {model_name: flax params}.
"""

from __future__ import annotations

import argparse
from typing import Dict

import numpy as np


def _conv_w(a):  # torch OIHW -> HWIO
    return np.transpose(a, (2, 3, 1, 0))


def _convT_w(a):  # torch IOHW -> HWIO
    return np.transpose(a, (2, 3, 0, 1))


def _mod_w(a):  # torch (1, O, I, kh, kw) -> HWIO
    return np.transpose(a[0], (2, 3, 1, 0))


def _lin_w(a):  # torch (out, in) -> (in, out)
    return np.transpose(a, (1, 0))


def _lin_w_chw(a, h: int, w: int):
    """Linear weight whose input is a FLATTENED FEATURE MAP.

    torch flattens NCHW channel-major (`models.py:373,423`); our NHWC
    models flatten h-major — so the input axis must be permuted
    (C,h,w) -> (h,w,C), not just transposed. (out, C*h*w) -> (h*w*C, out).
    For h = w = 1 this degenerates to `_lin_w`."""
    out_dim, in_total = a.shape
    c = in_total // (h * w)
    return np.transpose(
        a.reshape(out_dim, c, h, w), (2, 3, 1, 0)
    ).reshape(h * w * c, out_dim)


def _conv_layer(sd: Dict[str, np.ndarray], prefix: str, *, pad_module: bool,
                has_blur: bool, upsample: bool, activate_bias: bool,
                conv_bias: bool = False) -> dict:
    """Translate one reference ConvLayer (an nn.Sequential whose indices
    depend on padding/blur composition, `models.py:49-134`)."""
    idx = 0
    if has_blur and not upsample:
        idx += 1  # Blur before conv on the downsample path
    if pad_module:
        idx += 1  # ReflectionPad2d
    w = sd[f"{prefix}.{idx}.weight"]
    out = {"conv": {"weight": _convT_w(w) if upsample else _conv_w(w)}}
    if conv_bias:
        out["conv"]["bias"] = sd[f"{prefix}.{idx}.bias"]
    act_idx = idx + 1 + (1 if upsample else 0)  # Blur after conv when up
    if activate_bias:
        out["bias"] = sd[f"{prefix}.{act_idx}.bias"]
    return out


def _res_block(sd, prefix, *, padding: str, downsample: bool) -> dict:
    reflect = padding == "reflect"
    out = {
        "conv1": _conv_layer(sd, f"{prefix}.conv1", pad_module=reflect,
                             has_blur=False, upsample=False, activate_bias=True),
        "conv2": _conv_layer(sd, f"{prefix}.conv2", pad_module=reflect and not downsample,
                             has_blur=downsample, upsample=False,
                             activate_bias=True),
    }
    if any(k.startswith(f"{prefix}.skip.") for k in sd):
        out["skip"] = _conv_layer(sd, f"{prefix}.skip", pad_module=False,
                                  has_blur=downsample, upsample=False,
                                  activate_bias=False)
    return out


def _equal_linear(sd, prefix) -> dict:
    out = {"weight": _lin_w(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _styled_conv(sd, prefix) -> dict:
    return {
        "conv": {
            "weight": _mod_w(sd[f"{prefix}.conv.weight"]),
            "modulation": _equal_linear(sd, f"{prefix}.conv.modulation"),
        },
        "bias": sd[f"{prefix}.activate.bias"],
    }


def convert_encoder(sd) -> dict:
    p = {"stem0": _conv_layer(sd, "stem.0", pad_module=False, has_blur=False,
                              upsample=False, activate_bias=True)}
    for i in range(1, 5):
        p[f"stem{i}"] = _res_block(sd, f"stem.{i}", padding="reflect",
                                   downsample=True)
    p["structure0"] = _conv_layer(sd, "structure.0", pad_module=False,
                                  has_blur=False, upsample=False,
                                  activate_bias=True)
    p["structure1"] = _conv_layer(sd, "structure.1", pad_module=False,
                                  has_blur=False, upsample=False,
                                  activate_bias=True)
    p["texture0"] = _conv_layer(sd, "texture.0", pad_module=False,
                                has_blur=True, upsample=False,
                                activate_bias=True)
    p["texture1"] = _conv_layer(sd, "texture.1", pad_module=False,
                                has_blur=True, upsample=False,
                                activate_bias=True)
    # tanh head: conv only, no biases anywhere (bias gated by `not activate`)
    p["texture2"] = {"conv": {"weight": _conv_w(sd["texture.3.0.weight"])}}
    return p


def convert_generator(sd) -> dict:
    p = {}
    for i in range(8):
        pre = f"layers.{i}"
        blk = {
            "conv1": _styled_conv(sd, f"{pre}.conv1"),
            "conv2": _styled_conv(sd, f"{pre}.conv2"),
        }
        if any(k.startswith(f"{pre}.skip.") for k in sd):
            # upsampling skip = [EqualConvTranspose2d, Blur]; the Blur's
            # FIR kernel buffer at index 1 identifies it.
            upsample = f"{pre}.skip.1.kernel" in sd
            blk["skip"] = _conv_layer(
                sd, f"{pre}.skip", pad_module=False,
                has_blur=False, upsample=upsample, activate_bias=False,
            )
        p[f"layer{i}"] = blk
    p["to_rgb"] = _conv_layer(sd, "to_rgb", pad_module=False, has_blur=False,
                              upsample=False, activate_bias=False,
                              conv_bias=True)
    return p


def convert_structure_generator(sd) -> dict:
    p = {"stem0": _conv_layer(sd, "structure.0", pad_module=False,
                              has_blur=False, upsample=False,
                              activate_bias=True)}
    for i in (1, 2, 3):
        p[f"stem{i}"] = _res_block(sd, f"structure.{i}", padding="reflect",
                                   downsample=False)
    p["stem4"] = _conv_layer(sd, "structure.4", pad_module=False,
                             has_blur=False, upsample=False,
                             activate_bias=True)
    return p


def convert_extractor(sd) -> dict:
    p = {"stem0": _conv_layer(sd, "extract.0", pad_module=False,
                              has_blur=False, upsample=False,
                              activate_bias=True)}
    for i in (1, 2, 3):
        p[f"stem{i}"] = _res_block(sd, f"extract.{i}", padding="reflect",
                                   downsample=False)
    p["stem4"] = _conv_layer(sd, "extract.4", pad_module=False,
                             has_blur=False, upsample=False,
                             activate_bias=True)
    return p


def convert_dreal(sd, n_res: int) -> dict:
    p = {"conv0": _conv_layer(sd, "convs.0", pad_module=False, has_blur=False,
                              upsample=False, activate_bias=True)}
    for j in range(n_res):
        p[f"res{j}"] = _res_block(sd, f"convs.{j + 1}", padding="zero",
                                  downsample=True)
    p["final_conv"] = _conv_layer(sd, "final_conv", pad_module=False,
                                  has_blur=False, upsample=False,
                                  activate_bias=True)
    p["final_linear0"] = _equal_linear(sd, "final_linear.0")
    # final_conv output is 4x4 spatial (`models.py:363-365`): permute the
    # channel-major torch flatten to our h-major NHWC flatten.
    p["final_linear0"]["weight"] = _lin_w_chw(sd["final_linear.0.weight"], 4, 4)
    p["final_linear1"] = _equal_linear(sd, "final_linear.1")
    return p


def convert_dco(sd) -> dict:
    p = {"enc0": _conv_layer(sd, "encoder.0", pad_module=False, has_blur=False,
                             upsample=False, activate_bias=True)}
    downs = (True, True, True, True, True, False)
    for i, down in enumerate(downs):
        p[f"enc{i + 1}"] = _res_block(sd, f"encoder.{i + 1}", padding="zero",
                                      downsample=down)
    p["enc_final"] = _conv_layer(sd, "encoder.7", pad_module=False,
                                 has_blur=False, upsample=False,
                                 activate_bias=True)
    for i in range(4):
        p[f"lin{i}"] = _equal_linear(sd, f"linear.{i}")
    # lin0's input is the flattened (input-feat ++ ref-feat) map. 1x1
    # spatial below 512^2 (no-op); 2x2 at >=512^2 (`models.py:392-398`)
    # where the NCHW->NHWC flatten-order permutation matters.
    ch12 = sd["encoder.7.0.weight"].shape[0]
    feat = sd["linear.0.weight"].shape[1] // (2 * ch12)
    hw = int(round(feat ** 0.5))
    p["lin0"]["weight"] = _lin_w_chw(sd["linear.0.weight"], hw, hw)
    return p


def convert_ddist(sd) -> dict:
    return {f"lin{i}": _equal_linear(sd, f"model.{i}") for i in range(4)}


CONVERTERS = {
    "E": convert_encoder,
    "E_ema": convert_encoder,
    "G": convert_generator,
    "G_ema": convert_generator,
    "Gstru": convert_structure_generator,
    "Gstru_ema": convert_structure_generator,
    "Ex": convert_extractor,
    "Ex_ema": convert_extractor,
    "Dco": convert_dco,
    "Ddist": convert_ddist,
}


def convert_checkpoint(path: str, image_size: int = 256) -> Dict[str, dict]:
    """Load a reference train.py checkpoint and convert all model slots."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=True)
    trainer = raw["trainer"]
    out: Dict[str, dict] = {}
    import math

    n_res = int(math.log2(image_size)) - 2
    for name, sd_t in trainer.items():
        if name.endswith("optim"):
            continue
        sd = {k: v.numpy() for k, v in sd_t.items()}
        if name == "Dreal":
            out[name] = {"params": convert_dreal(sd, n_res)}
        elif name in CONVERTERS:
            out[name] = {"params": CONVERTERS[name](sd)}
    return out


def check_against_models(converted: Dict[str, dict], image_size: int,
                         channel: int = 32, N: int = 1,
                         texture_channel: int = 2048,
                         structure_channel: int = 8) -> None:
    """Structural parity check (the role of convert_weight.py:243-278's
    output comparison, adapted: the torch reference cannot run here, so
    we verify every converted tree is exactly init-compatible — same
    keys, same shapes — with the target flax models)."""
    import jax
    import jax.numpy as jnp

    from ideas_tpu.config import TrainConfig
    from ideas_tpu.models import init_model

    cfg = TrainConfig(image_size=image_size, channel=channel, N=N,
                      texture_channel=texture_channel,
                      structure_channel=structure_channel)
    res = image_size // 16
    patch = image_size // 4
    inputs = {
        "E": (jnp.zeros((1, image_size, image_size, 3)),),
        "G": (jnp.zeros((1, res, res, cfg.structure_channel)),
              jnp.zeros((1, cfg.texture_channel))),
        "Gstru": (jnp.zeros((1, res, res, N)),),
        "Ex": (jnp.zeros((1, res, res, cfg.structure_channel)),),
        "Ddist": (jnp.zeros((1, cfg.texture_channel)),),
        "Dreal": (jnp.zeros((1, image_size, image_size, 3)),),
        "Dco": (jnp.zeros((1, patch, patch, 3)),
                jnp.zeros((2, patch, patch, 3))),
    }
    # Static (non-array) init kwargs: must NOT pass through eval_shape's
    # abstraction (ref_batch feeds a reshape and has to stay concrete).
    static_kwargs = {"Dco": {"ref_batch": 2}}
    names = {"E": "DisentanglementEncoder", "G": "Generator",
             "Gstru": "StructureGenerator", "Ex": "TensorExtractor",
             "Ddist": "DistributionDiscriminator",
             "Dreal": "ImageLevelDiscriminator",
             "Dco": "CooccurenceDiscriminator"}
    for slot, model_name in names.items():
        if slot not in converted:
            continue
        model = init_model(model_name, cfg)
        kw = static_kwargs.get(slot, {})
        want = jax.eval_shape(
            lambda *a: model.init(jax.random.PRNGKey(0), *a, **kw),
            *inputs[slot]
        )["params"]
        got = converted[slot]["params"]
        flat_w = jax.tree_util.tree_flatten_with_path(want)[0]
        flat_g = jax.tree_util.tree_flatten_with_path(got)[0]
        paths_w = {jax.tree_util.keystr(p): tuple(v.shape) for p, v in flat_w}
        paths_g = {jax.tree_util.keystr(p): tuple(v.shape) for p, v in flat_g}
        if paths_w != paths_g:
            missing = set(paths_w) - set(paths_g)
            extra = set(paths_g) - set(paths_w)
            mismatch = {k: (paths_w[k], paths_g[k])
                        for k in set(paths_w) & set(paths_g)
                        if paths_w[k] != paths_g[k]}
            raise ValueError(
                f"{slot}: converted tree != model tree; missing={missing} "
                f"extra={extra} shape-mismatch={mismatch}"
            )
        print(f"{slot}: OK ({len(paths_w)} arrays)")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--channel", type=int, default=32)
    p.add_argument("--N", type=int, default=1)
    p.add_argument("--out", required=True)
    p.add_argument("--check", action="store_true",
                   help="validate converted trees against model.init shapes")
    a = p.parse_args(argv)
    converted = convert_checkpoint(a.ckpt, a.image_size)
    if a.check:
        check_against_models(converted, a.image_size, a.channel, a.N)
    flat = {}

    def flatten(tree, prefix):
        for k, v in tree.items():
            if isinstance(v, dict):
                flatten(v, f"{prefix}{k}/")
            else:
                flat[f"{prefix}{k}"] = v

    for model, tree in converted.items():
        flatten(tree, f"{model}/")
    np.savez(a.out, **flat)
    print(f"wrote {len(flat)} arrays to {a.out}")


if __name__ == "__main__":
    main()
