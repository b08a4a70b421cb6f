"""Hide / reveal serving CLI.

The reference only exercises hide/reveal inside the training loop's
sampling block (`/root/reference/train.py:249-293`); this CLI exposes
them as standalone production paths over a trained checkpoint:

    # hide: message bits (or a file's bytes) -> stego PNGs
    python -m ideas_tpu.stego_cli hide --ckpt-dir ... --message-file secret.bin \
        --out stego/ --size 256

    # reveal: stego PNGs -> message bits
    python -m ideas_tpu.stego_cli reveal --ckpt-dir ... --images stego/ \
        --out recovered.bin --size 256

Payload: N * (size/16)^2 * sigma bits per image (256 bits at 256^2,
N=1, sigma=1 — BASELINE.md).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def _load_trainer(a):
    from ideas_tpu.checkpoint import CheckpointManager
    from ideas_tpu.config import TrainConfig
    from ideas_tpu.train import Trainer

    cfg = TrainConfig(image_size=a.size, channel=a.channel, N=a.N,
                      texture_channel=a.texture_channel, batch_size=a.batch)
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state = CheckpointManager(a.ckpt_dir).restore(state)
    return trainer, state, cfg


def _bits_per_image(cfg, sigma):
    return cfg.N * (cfg.image_size // 16) ** 2 * sigma


def cmd_hide(a):
    from ideas_tpu.utils import to_uint8
    from PIL import Image

    trainer, state, cfg = _load_trainer(a)
    bpi = _bits_per_image(cfg, a.sigma)

    if a.message_file:
        data = np.fromfile(a.message_file, np.uint8)
        bits = np.unpackbits(data).astype(np.float32)
    else:
        bits = np.asarray(
            jax.random.bernoulli(jax.random.PRNGKey(a.seed), 0.5,
                                 (a.batch * bpi,))
        ).astype(np.float32)
    n_img = int(np.ceil(len(bits) / bpi))
    pad = n_img * bpi - len(bits)
    bits = np.pad(bits, (0, pad))
    os.makedirs(a.out, exist_ok=True)
    key = jax.random.PRNGKey(a.seed)
    for start in range(0, n_img, a.batch):
        chunk = bits[start * bpi : (start + a.batch) * bpi]
        b = len(chunk) // bpi
        if b < a.batch:  # pad the trailing batch for the compiled shape
            chunk = np.pad(chunk, (0, (a.batch - b) * bpi))
        msg = jnp.asarray(chunk.reshape(a.batch, bpi))
        key, k1, k2 = jax.random.split(key, 3)
        t2 = jax.random.uniform(k1, (a.batch, cfg.texture_channel),
                                jnp.float32, -1, 1)
        img, _ = trainer.hide(state, msg, t2, k2, sigma=a.sigma, delta=a.delta)
        img = to_uint8(np.asarray(jax.device_get(img)))
        for j in range(b):
            Image.fromarray(img[j]).save(
                os.path.join(a.out, f"{start + j:06d}.png")
            )
    print(f"hid {len(bits) - pad} bits into {n_img} images under {a.out} "
          f"({bpi} bits/image)")


def cmd_reveal(a):
    from PIL import Image

    trainer, state, cfg = _load_trainer(a)
    bpi = _bits_per_image(cfg, a.sigma)
    files = sorted(
        os.path.join(a.images, f) for f in os.listdir(a.images)
        if f.lower().endswith(".png")
    )
    all_bits = []
    for start in range(0, len(files), a.batch):
        batch_files = files[start : start + a.batch]
        imgs = np.stack([
            np.asarray(Image.open(f).convert("RGB"), np.float32) / 127.5 - 1.0
            for f in batch_files
        ])
        b = len(imgs)
        if b < a.batch:
            imgs = np.pad(imgs, ((0, a.batch - b), (0, 0), (0, 0), (0, 0)))
        msg, _ = trainer.reveal(state, jnp.asarray(imgs), sigma=a.sigma)
        all_bits.append(np.asarray(jax.device_get(msg))[:b].reshape(-1))
    bits = np.concatenate(all_bits).astype(np.uint8)
    if a.out:
        np.packbits(bits).tofile(a.out)
        print(f"recovered {len(bits)} bits -> {a.out}")
    else:
        print("".join(map(str, bits[:256])) + ("..." if len(bits) > 256 else ""))


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("hide", "reveal"):
        ps = sub.add_parser(name)
        ps.add_argument("--ckpt-dir", required=True)
        ps.add_argument("--size", type=int, default=256)
        ps.add_argument("--channel", type=int, default=32)
        ps.add_argument("--texture_channel", type=int, default=2048)
        ps.add_argument("--N", type=int, default=1)
        ps.add_argument("--batch", type=int, default=8)
        ps.add_argument("--sigma", type=int, default=1)
        ps.add_argument("--seed", type=int, default=0)
        if name == "hide":
            ps.add_argument("--message-file", default=None)
            ps.add_argument("--delta", type=float, default=0.5)
            ps.add_argument("--out", required=True)
        else:
            ps.add_argument("--images", required=True)
            ps.add_argument("--out", default=None)
    a = p.parse_args(argv)
    (cmd_hide if a.cmd == "hide" else cmd_reveal)(a)


if __name__ == "__main__":
    main()
