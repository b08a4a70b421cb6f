"""Vanilla StyleGAN2 training CLI (parity with
`/root/reference/stylegan2/train.py:339-459`):

    python -m ideas_tpu.stylegan2.train_cli --path data/ffhq --size 256 \
        --iter 800000 --batch 16

Runs data-parallel over all visible chips; optional ADA via --augment.
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

from ideas_tpu import parallel
from ideas_tpu.checkpoint import CheckpointManager
from ideas_tpu.data import make_dataset, data_iterator
from ideas_tpu.stylegan2.train import SG2Config, SG2Trainer
from ideas_tpu.utils import save_image_grid, time_change


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--path", type=str, default="")
    p.add_argument("--dataset_type", choices=["lmdb", "normal", "synthetic"],
                   default="normal")
    p.add_argument("--iter", type=int, default=800000)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--r1", type=float, default=10)
    p.add_argument("--path_regularize", type=float, default=2)
    p.add_argument("--path_batch_shrink", type=int, default=2)
    p.add_argument("--d_reg_every", type=int, default=16)
    p.add_argument("--g_reg_every", type=int, default=4)
    p.add_argument("--mixing", type=float, default=0.9)
    p.add_argument("--lr", type=float, default=0.002)
    p.add_argument("--channel_multiplier", type=int, default=2)
    p.add_argument("--augment", action="store_true")
    p.add_argument("--augment_p", type=float, default=0)
    p.add_argument("--ada_target", type=float, default=0.6)
    p.add_argument("--ada_length", type=int, default=500 * 1000)
    p.add_argument("--n_sample", type=int, default=16)
    p.add_argument("--exp_dir", type=str, default="experiments/sg2")
    p.add_argument("--log_every", type=int, default=100)
    p.add_argument("--save_every", type=int, default=10000)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args(argv)

    cfg = SG2Config(
        size=a.size, lr=a.lr, r1=a.r1, path_regularize=a.path_regularize,
        path_batch_shrink=a.path_batch_shrink, d_reg_every=a.d_reg_every,
        g_reg_every=a.g_reg_every, mixing=a.mixing,
        channel_multiplier=a.channel_multiplier, augment_p=a.augment_p,
        ada_target=a.ada_target, ada_length=a.ada_length, batch_size=a.batch,
    )
    os.makedirs(os.path.join(a.exp_dir, "sample"), exist_ok=True)
    ckpt_dir = os.path.join(a.exp_dir, "checkpoint")
    mesh = parallel.make_mesh()
    trainer = SG2Trainer(cfg, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(a.seed))
    manager = CheckpointManager(ckpt_dir)
    start = 0
    if manager.latest_step() is not None:
        state = manager.restore(state)
        start = int(jax.device_get(state.step))
        print(f"resumed at {start}")

    dataset = make_dataset(a.dataset_type, a.path, a.size)
    loader = data_iterator(dataset, a.batch, seed=a.seed)
    key = jax.random.PRNGKey(a.seed + 1)
    # One jitted EMA sampler for the whole run — building a fresh
    # jax.jit(lambda ...) inside the save block would re-trace and
    # re-compile the generator on every checkpoint (minutes each on the
    # remote-compile relay).
    sample_ema = jax.jit(lambda p, z: trainer.G.apply(p, [z]))

    t0 = time.time()
    for i in range(start + 1, a.iter + 1):
        x = parallel.shard_batch(mesh, next(loader))
        key, sub = jax.random.split(key)
        fn = trainer.step_fn(
            do_r1=i % a.d_reg_every == 0,
            do_path=i % a.g_reg_every == 0,
            use_ada=a.augment,
            donate=True,
        )
        state, metrics = fn(state, x, sub)
        if i % a.log_every == 0:
            m = {k: float(v) for k, v in jax.device_get(metrics).items()}
            used = time.time() - t0
            print(
                f"[{i}/{a.iter}] d: {m['d']:.4f} g: {m['g']:.4f} "
                f"r1: {m.get('r1', 0):.4f} path: {m.get('path', 0):.4f} "
                f"ada_p: {float(jax.device_get(state.ada_p)):.3f} "
                f"elapsed {time_change(used)}",
                flush=True,
            )
        if i % a.save_every == 0 or i == a.iter:
            key, sub = jax.random.split(key)
            z = jax.random.normal(sub, (a.n_sample, cfg.style_dim))
            img, _ = sample_ema(state.g_ema, z)
            save_image_grid(
                np.asarray(jax.device_get(img)),
                os.path.join(a.exp_dir, "sample", f"{i:06d}.png"),
                nrow=int(a.n_sample ** 0.5),
            )
            manager.save(i, jax.device_get(state))
            print(f"saved checkpoint {i}", flush=True)


if __name__ == "__main__":
    main()
