"""Project images into SG2 latent space
(`/root/reference/stylegan2/projector.py` CLI):

    python -m ideas_tpu.stylegan2.projector_cli --ckpt-dir ... --size 256 \
        --step 1000 img1.png img2.png
"""

from __future__ import annotations

import argparse
import math
import os

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    from PIL import Image

    from ideas_tpu.checkpoint import CheckpointManager
    from ideas_tpu.eval.lpips import LPIPS
    from ideas_tpu.models.stylegan2 import SG2Generator
    from ideas_tpu.stylegan2.projector import project
    from ideas_tpu.stylegan2.train import SG2Config, SG2Trainer
    from ideas_tpu.utils import save_image_grid

    p = argparse.ArgumentParser()
    p.add_argument("files", nargs="+")
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--step", type=int, default=1000)
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--noise-regularize", type=float, default=1e5)
    p.add_argument("--mse", type=float, default=0.0)
    p.add_argument("--n-mean-latent", type=int, default=10000)
    p.add_argument("--lpips-weights", default=None,
                   help=".npz of converted VGG16 weights (else random init)")
    p.add_argument("--lpips-linear", default=None)
    p.add_argument("--out", default="projection")
    a = p.parse_args(argv)

    cfg = SG2Config(size=a.size)
    trainer = SG2Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state = CheckpointManager(a.ckpt_dir).restore(state)
    g, g_params = trainer.G, state.g_ema

    imgs = []
    for f in a.files:
        with Image.open(f) as im:
            im = im.convert("RGB").resize((a.size, a.size), Image.LANCZOS)
            imgs.append(np.asarray(im, np.float32) / 127.5 - 1.0)
    target = jnp.asarray(np.stack(imgs))

    lp = LPIPS(net="vgg")
    if a.lpips_weights and a.lpips_linear:
        from ideas_tpu.eval.lpips import load_weights_npz

        lp_params = load_weights_npz("vgg", a.lpips_weights, a.lpips_linear)
    else:
        from ideas_tpu.eval.lpips import fixed_params

        print("WARNING: fixed-seed LPIPS backbone + official lin heads "
              "(pass --lpips-weights for the true metric)")
        lp_params = fixed_params("vgg", target.shape[1])
    lpips_fn = lambda x, y: lp.apply(lp_params, x, y)

    key = jax.random.PRNGKey(1)
    key, sub = jax.random.split(key)
    z = jax.random.normal(sub, (a.n_mean_latent, cfg.style_dim))
    # Params as jit args (closure constants bloat the remote-compile payload).
    w = jax.jit(
        lambda p, z: g.apply(p, z, method=SG2Generator.map_latent)
    )(g_params, z)
    mean_latent = jnp.mean(w, 0, keepdims=True)
    # Reference `projector.py:62`: sum over ALL elements / n_mean_latent
    # (NOT a per-element mean — that would shrink the latent-noise
    # annealing scale by sqrt(style_dim)).
    latent_std = float(
        jnp.sqrt(jnp.sum(jnp.square(w - mean_latent)) / a.n_mean_latent)
    )

    latent, noises, hist = project(
        g.apply, g_params, lpips_fn, mean_latent, latent_std, target,
        num_layers=g.n_latent, key=key, steps=a.step, initial_lr=a.lr,
        noise_regularize_weight=a.noise_regularize, mse_weight=a.mse,
    )
    for step, loss, ploss in hist:
        print(f"step {step}: loss {loss:.4f} perceptual {ploss:.4f}")

    lat_full = jnp.repeat(latent[:, None, :], g.n_latent, axis=1)
    img, _ = jax.jit(
        lambda p, l, n: g.apply(p, [l], input_is_latent=True, noise=n)
    )(g_params, lat_full, noises)
    os.makedirs(a.out, exist_ok=True)
    save_image_grid(
        np.concatenate([np.asarray(target), np.asarray(img)], 0),
        os.path.join(a.out, "projection.png"), nrow=len(a.files),
    )
    np.savez(os.path.join(a.out, "latents.npz"),
             latent=np.asarray(latent),
             **{f"noise{i}": np.asarray(n) for i, n in enumerate(noises)})
    print(f"wrote {a.out}/projection.png and latents.npz")


if __name__ == "__main__":
    main()
