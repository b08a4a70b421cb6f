"""FID CLIs (parity with `/root/reference/stylegan2/{calc_inception,fid}.py`).

Precompute real statistics:
    python -m ideas_tpu.eval.fid_cli stats --path data/bedroom \
        --dataset_type lmdb --size 256 --n_sample 50000 \
        --inception weights/inception.npz --out bedroom_stats.npz

Score an IDEAS checkpoint:
    python -m ideas_tpu.eval.fid_cli fid --stats bedroom_stats.npz \
        --ckpt-dir experiments/bedroom/checkpoints --n_sample 50000 \
        --inception weights/inception.npz
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def _feature_fn(inception_path, size):
    from ideas_tpu.eval import fid as fid_lib
    from ideas_tpu.eval.inception import fixed_params, load_params_npz

    if inception_path:
        params = load_params_npz(inception_path)
    else:
        print("WARNING: no --inception weights; using the fixed-seed "
              "extractor (relative FID only, NOT comparable to paper "
              "numbers — see PERF.md 'FID provenance')")
        params = fixed_params(size)
    return fid_lib.make_feature_fn(params)


def cmd_stats(a):
    from ideas_tpu.data import make_dataset, data_iterator
    from ideas_tpu.eval import fid as fid_lib

    feature_fn = _feature_fn(a.inception, a.size)
    dataset = make_dataset(a.dataset_type, a.path, a.size)
    loader = data_iterator(dataset, a.batch, seed=0)

    def batches():
        while True:
            yield next(loader)

    feats = fid_lib.extract_features(feature_fn, batches(), a.n_sample)
    mu, sigma = fid_lib.compute_stats(feats)
    np.savez(a.out, mu=mu, sigma=sigma, n=len(feats))
    print(f"wrote stats for {len(feats)} images to {a.out}")


def cmd_fid(a):
    from ideas_tpu.checkpoint import CheckpointManager
    from ideas_tpu.config import TrainConfig
    from ideas_tpu.eval import fid as fid_lib
    from ideas_tpu.train import Trainer

    stats = np.load(a.stats)
    feature_fn = _feature_fn(a.inception, a.size)

    cfg = TrainConfig(image_size=a.size, channel=a.channel, N=a.N,
                      batch_size=a.batch)
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state = CheckpointManager(a.ckpt_dir).restore(state)

    key = jax.random.PRNGKey(1)
    res = a.size // 16

    def fake_batches():
        nonlocal key
        while True:
            key, k1, k2, k3 = jax.random.split(key, 4)
            msg = jax.random.bernoulli(
                k1, 0.5, (a.batch, cfg.N * res * res)
            ).astype(jnp.float32)
            t2 = jax.random.uniform(
                k2, (a.batch, cfg.texture_channel), jnp.float32, -1, 1
            )
            img, _ = trainer.hide(state, msg, t2, k3, delta=a.delta)
            yield img

    feats = fid_lib.extract_features(feature_fn, fake_batches(), a.n_sample)
    mu, sigma = fid_lib.compute_stats(feats)
    score = fid_lib.fid_from_stats(stats["mu"], stats["sigma"], mu, sigma)
    print(f"FID ({a.n_sample} samples, delta={a.delta}): {score:.4f}")


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    ps = sub.add_parser("stats")
    ps.add_argument("--path", required=True)
    ps.add_argument("--dataset_type", default="lmdb")
    ps.add_argument("--size", type=int, default=256)
    ps.add_argument("--batch", type=int, default=64)
    ps.add_argument("--n_sample", type=int, default=50000)
    ps.add_argument("--inception", default=None)
    ps.add_argument("--out", required=True)
    pf = sub.add_parser("fid")
    pf.add_argument("--stats", required=True)
    pf.add_argument("--ckpt-dir", required=True)
    pf.add_argument("--size", type=int, default=256)
    pf.add_argument("--channel", type=int, default=32)
    pf.add_argument("--N", type=int, default=1)
    pf.add_argument("--batch", type=int, default=64)
    pf.add_argument("--n_sample", type=int, default=50000)
    pf.add_argument("--delta", type=float, default=0.5)
    pf.add_argument("--inception", default=None)
    a = p.parse_args(argv)
    if a.cmd == "stats":
        cmd_stats(a)
    else:
        cmd_fid(a)


if __name__ == "__main__":
    main()
