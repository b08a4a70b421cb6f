"""Sample images from a trained SG2 generator
(`/root/reference/stylegan2/generate.py`): load a checkpoint's g_ema,
draw z's, optional truncation, save PNG grids.

    python -m ideas_tpu.stylegan2.generate --ckpt-dir experiments/sg2/checkpoints \
        --size 256 --pics 4 --sample 8 --truncation 0.7
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def generate(g, g_params, key, n_pics, n_sample, truncation, out_dir,
             style_dim):
    from ideas_tpu.models.stylegan2 import SG2Generator
    from ideas_tpu.utils import save_image_grid

    os.makedirs(out_dir, exist_ok=True)
    mean_latent = None
    if truncation < 1:
        key, sub = jax.random.split(key)
        # jit: eager model code remote-compiles op-by-op on the TPU relay.
        # Params go in as jit *arguments*, not closure constants — a
        # closed-over tree is baked into the traced program (extra device
        # copy + larger remote-compile payload on the relay).
        mean_latent = jax.jit(
            lambda p, k: g.apply(p, k, 4096, method=SG2Generator.mean_latent)
        )(g_params, sub)

    @jax.jit
    def sample(p, ml, z):
        img, _ = g.apply(p, [z], truncation=truncation,
                         truncation_latent=ml)
        return img

    for i in range(n_pics):
        key, sub = jax.random.split(key)
        z = jax.random.normal(sub, (n_sample, style_dim))
        img = jax.device_get(sample(g_params, mean_latent, z))
        save_image_grid(img, os.path.join(out_dir, f"{i:06d}.png"),
                        nrow=int(n_sample ** 0.5) or 1)


def main(argv=None):
    from ideas_tpu.checkpoint import CheckpointManager
    from ideas_tpu.models.stylegan2 import SG2Generator
    from ideas_tpu.stylegan2.train import SG2Config, SG2Trainer

    p = argparse.ArgumentParser()
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--style-dim", type=int, default=512)
    p.add_argument("--n-mlp", type=int, default=8)
    p.add_argument("--channel-multiplier", type=int, default=2)
    p.add_argument("--pics", type=int, default=20)
    p.add_argument("--sample", type=int, default=1)
    p.add_argument("--truncation", type=float, default=1.0)
    p.add_argument("--out", default="sample")
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args(argv)

    cfg = SG2Config(size=a.size, style_dim=a.style_dim, n_mlp=a.n_mlp,
                    channel_multiplier=a.channel_multiplier)
    trainer = SG2Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    manager = CheckpointManager(a.ckpt_dir)
    state = manager.restore(state)
    generate(trainer.G, state.g_ema, jax.random.PRNGKey(a.seed),
             a.pics, a.sample, a.truncation, a.out, a.style_dim)


if __name__ == "__main__":
    main()
