"""Serving CLI (hide/reveal) end-to-end + 512^2 model-zoo shapes.

The reference has no standalone serving path (hide/reveal live inside the
training loop's sampling block, `/root/reference/train.py:249-305`);
`ideas_tpu.stego_cli` exposes them over a checkpoint. This test drives
the CLI through its real argv entry: init state -> orbax checkpoint ->
`hide` (file bytes -> PNGs) -> `reveal` (PNGs -> recovered .bin),
asserting the payload/batching/padding plumbing. Bit accuracy is NOT
asserted (untrained nets extract at chance); training-time accuracy is
covered by the online eval in test_train_step.
"""

import os

import jax
import numpy as np
import pytest

from ideas_tpu import stego_cli
from ideas_tpu.checkpoint import CheckpointManager
from ideas_tpu.config import tiny_config
from ideas_tpu.train import Trainer


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    cfg = tiny_config(image_size=64, channel=8, texture_channel=64, batch_size=2)
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    d = tmp_path_factory.mktemp("ckpt")
    CheckpointManager(str(d)).save(0, state)
    return str(d)


def test_hide_reveal_cli_roundtrip(ckpt_dir, tmp_path):
    # 64^2, N=1, sigma=1 -> 16 bits/image; 8 bytes = 64 bits -> 4 images,
    # exercising multi-image chunking AND trailing-batch padding (batch 3).
    secret = tmp_path / "secret.bin"
    secret.write_bytes(bytes(range(8)))
    out_dir = tmp_path / "stego"
    common = ["--ckpt-dir", ckpt_dir, "--size", "64", "--channel", "8",
              "--texture_channel", "64", "--batch", "3"]
    stego_cli.main(["hide", *common, "--message-file", str(secret),
                    "--out", str(out_dir)])
    pngs = sorted(os.listdir(out_dir))
    assert pngs == [f"{i:06d}.png" for i in range(4)]

    from PIL import Image
    img = np.asarray(Image.open(out_dir / pngs[0]))
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8

    recovered = tmp_path / "recovered.bin"
    stego_cli.main(["reveal", *common, "--images", str(out_dir),
                    "--out", str(recovered)])
    rec = np.fromfile(recovered, np.uint8)
    # 4 images x 16 bits = 64 bits = 8 bytes recovered.
    assert rec.size == 8


def test_zoo_512(tiny=None):
    """All seven nets at image_size=512 — pins the CooccurenceDiscriminator
    k_size/feat_size switch above 511 (`/root/reference/models.py:392-398`)
    and the size-keyed channel dicts."""
    import jax.numpy as jnp

    from ideas_tpu.models import init_model

    cfg = tiny_config(image_size=512, channel=4, texture_channel=64,
                      batch_size=1, n_crop=2, ref_crop=2)
    res = 512 // 16
    k = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 512, 512, 3))

    E = init_model("DisentanglementEncoder", cfg)
    pE = E.init(k, x)
    S, T = E.apply(pE, x)
    assert S.shape == (1, res, res, cfg.structure_channel)
    assert T.shape == (1, cfg.texture_channel)

    G = init_model("Generator", cfg)
    img = G.apply(G.init(k, S, T), S, T)
    assert img.shape == (1, 512, 512, 3)

    Gs = init_model("StructureGenerator", cfg)
    z = jnp.zeros((1, res, res, cfg.N))
    assert Gs.apply(Gs.init(k, z), z).shape == S.shape

    Ex = init_model("TensorExtractor", cfg)
    assert Ex.apply(Ex.init(k, S), S).shape == z.shape

    D = init_model("ImageLevelDiscriminator", cfg)
    assert D.apply(D.init(k, x), x).shape == (1, 1)

    Dd = init_model("DistributionDiscriminator", cfg)
    assert Dd.apply(Dd.init(k, T), T).shape == (1, 1)

    Dco = init_model("CooccurenceDiscriminator", cfg)
    patch = jnp.zeros((2, 128, 128, 3))
    ref = jnp.zeros((2 * cfg.ref_crop, 128, 128, 3))
    pDco = Dco.init(k, patch, ref, cfg.ref_crop)
    logits, ref_feat = Dco.apply(pDco, patch, ref, cfg.ref_crop)
    assert logits.shape == (2, 1)
    logits2, _ = Dco.apply(pDco, patch, ref_input=ref_feat)
    assert logits2.shape == (2, 1)
