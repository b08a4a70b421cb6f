"""Converter structural test: a reference-shaped torch state_dict (built
synthetically from our own init, inverse-transformed) must convert into a
param tree identical in structure and values to `model.init`'s."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ideas_tpu.config import tiny_config
from ideas_tpu.models import init_model
from ideas_tpu.tools import convert_torch_ckpt as cc


CFG = tiny_config()


def _inv_conv(a):  # HWIO -> torch OIHW
    return np.transpose(a, (3, 2, 0, 1))


def _inv_convT(a):  # HWIO -> torch IOHW
    return np.transpose(a, (2, 3, 0, 1))


def _inv_mod(a):  # HWIO -> (1, O, I, kh, kw)
    return np.transpose(a, (3, 2, 0, 1))[None]


def _inv_lin(a):
    return np.transpose(a, (1, 0))


def _emit_conv_layer(sd, prefix, tree, *, pad_module, has_blur, upsample,
                     activate_bias, conv_bias=False):
    idx = (1 if has_blur and not upsample else 0) + (1 if pad_module else 0)
    w = np.asarray(tree["conv"]["weight"])
    sd[f"{prefix}.{idx}.weight"] = _inv_convT(w) if upsample else _inv_conv(w)
    if conv_bias:
        sd[f"{prefix}.{idx}.bias"] = np.asarray(tree["conv"]["bias"])
    if upsample:
        sd[f"{prefix}.{idx + 1}.kernel"] = np.zeros((4, 4), np.float32)
    if activate_bias:
        act = idx + 1 + (1 if upsample else 0)
        sd[f"{prefix}.{act}.bias"] = np.asarray(tree["bias"])


def _emit_res_block(sd, prefix, tree, *, padding, downsample):
    reflect = padding == "reflect"
    _emit_conv_layer(sd, f"{prefix}.conv1", tree["conv1"], pad_module=reflect,
                     has_blur=False, upsample=False, activate_bias=True)
    _emit_conv_layer(sd, f"{prefix}.conv2", tree["conv2"],
                     pad_module=reflect and not downsample,
                     has_blur=downsample, upsample=False, activate_bias=True)
    if "skip" in tree:
        _emit_conv_layer(sd, f"{prefix}.skip", tree["skip"], pad_module=False,
                         has_blur=downsample, upsample=False,
                         activate_bias=False)


def _tree_equal(a, b, path=""):
    assert set(a.keys()) == set(b.keys()), (
        f"{path}: {sorted(a.keys())} != {sorted(b.keys())}"
    )
    for k in a:
        if isinstance(a[k], dict):
            _tree_equal(a[k], b[k], f"{path}/{k}")
        else:
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k]), atol=1e-6,
                err_msg=f"{path}/{k}",
            )


def test_encoder_roundtrip():
    m = init_model("DisentanglementEncoder", CFG)
    x = jnp.zeros((1, CFG.image_size, CFG.image_size, 3))
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x)["params"]

    sd = {}
    _emit_conv_layer(sd, "stem.0", params["stem0"], pad_module=False,
                     has_blur=False, upsample=False, activate_bias=True)
    for i in range(1, 5):
        _emit_res_block(sd, f"stem.{i}", params[f"stem{i}"],
                        padding="reflect", downsample=True)
    for j in (0, 1):
        _emit_conv_layer(sd, f"structure.{j}", params[f"structure{j}"],
                         pad_module=False, has_blur=False, upsample=False,
                         activate_bias=True)
    for j in (0, 1):
        _emit_conv_layer(sd, f"texture.{j}", params[f"texture{j}"],
                         pad_module=False, has_blur=True, upsample=False,
                         activate_bias=True)
    sd["texture.3.0.weight"] = _inv_conv(np.asarray(params["texture2"]["conv"]["weight"]))

    got = cc.convert_encoder(sd)
    _tree_equal(params, got)


def test_generator_roundtrip():
    m = init_model("Generator", CFG)
    res = CFG.image_size // 16
    s = jnp.zeros((1, res, res, CFG.structure_channel))
    t = jnp.zeros((1, CFG.texture_channel))
    params = jax.jit(m.init)(jax.random.PRNGKey(0), s, t)["params"]

    sd = {}
    for i in range(8):
        blk = params[f"layer{i}"]
        for cname in ("conv1", "conv2"):
            c = blk[cname]
            sd[f"layers.{i}.{cname}.conv.weight"] = _inv_mod(
                np.asarray(c["conv"]["weight"]))
            sd[f"layers.{i}.{cname}.conv.modulation.weight"] = _inv_lin(
                np.asarray(c["conv"]["modulation"]["weight"]))
            sd[f"layers.{i}.{cname}.conv.modulation.bias"] = np.asarray(
                c["conv"]["modulation"]["bias"])
            sd[f"layers.{i}.{cname}.activate.bias"] = np.asarray(c["bias"])
        if "skip" in blk:
            up = bool(i >= 4)
            _emit_conv_layer(sd, f"layers.{i}.skip", blk["skip"],
                             pad_module=False, has_blur=False, upsample=up,
                             activate_bias=False)
    _emit_conv_layer(sd, "to_rgb", params["to_rgb"], pad_module=False,
                     has_blur=False, upsample=False, activate_bias=False,
                     conv_bias=True)

    got = cc.convert_generator(sd)
    _tree_equal(params, got)

    # the CLI's --check validator accepts a correct tree and rejects a
    # corrupted one
    cc.check_against_models(
        {"G": {"params": got}}, CFG.image_size, CFG.channel, CFG.N,
        texture_channel=CFG.texture_channel,
    )
    bad = {"G": {"params": {**got, "layer0": got["layer1"]}}}
    with pytest.raises(ValueError):
        cc.check_against_models(
            bad, CFG.image_size, CFG.channel, CFG.N,
            texture_channel=CFG.texture_channel,
        )


def test_check_against_models_dco_slot():
    """--check must handle the Dco slot: ref_batch is a STATIC init arg
    (an eval_shape-abstracted ref_batch feeds a reshape and crashes —
    round-2 review regression)."""
    import jax.numpy as jnp

    m = init_model("CooccurenceDiscriminator", CFG)
    patch = CFG.image_size // 4
    p = jax.jit(m.init, static_argnums=3)(
        jax.random.PRNGKey(0), jnp.zeros((1, patch, patch, 3)),
        jnp.zeros((2, patch, patch, 3)), 2,
    )["params"]
    cc.check_against_models(
        {"Dco": {"params": p}}, CFG.image_size, CFG.channel, CFG.N,
        texture_channel=CFG.texture_channel,
    )
