"""Relative-FID trajectory of a training run's checkpoints.

For every retained checkpoint of an experiment, generates stego images
through the EMA serving path (message -> Z -> Gstru -> G with random
textures, the reference's FID protocol: `/root/reference/stylegan2/fid.py:
60-107` samples the generator and compares against the dataset stats)
and computes FID against the run's own training distribution.

Extractor: the deterministic `fixed_params` InceptionV3 fallback
(`ideas_tpu/eval/inception.py:195-206`) — the real FID-Inception weights
(`/root/reference/stylegan2/inception.py:13`) are download-only and
unobtainable offline, so ABSOLUTE values are not paper-comparable; the
TRAJECTORY (is image quality improving / stable across the run?) is the
deliverable, and it is self-consistent because the extractor is fixed.

    python tools_fid_trajectory.py <exp_dir> [n_sample=5000] [batch=32]

One TPU process; a few minutes of compiles, then ~1-2 min/checkpoint.
Emits one JSON line per checkpoint plus a summary table.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tools_final_eval import _cfg_from_experiment


def main():
    exp_dir = sys.argv[1]
    n_sample = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    # Only evaluate checkpoints at multiples of `every` (bounds the wall
    # time of an 80k run with 40 retained checkpoints to ~10 points).
    every = int(sys.argv[4]) if len(sys.argv) > 4 else 1

    from ideas_tpu.checkpoint import CheckpointManager
    from ideas_tpu.data.device_synthetic import synthetic_batch
    from ideas_tpu.eval.fid import (compute_stats, extract_features,
                                    fid_from_stats, make_feature_fn)
    from ideas_tpu.eval.inception import fixed_params
    from ideas_tpu.train import Trainer

    cfg = _cfg_from_experiment(exp_dir)
    family = "default"
    for line in open(f"{exp_dir}/training_config.txt"):
        if line.startswith("synthetic_family:"):
            family = line.split(":", 1)[1].strip()
    print(f"config: size={cfg.image_size} channel={cfg.channel} N={cfg.N} "
          f"family={family}; n_sample={n_sample} batch={batch}", flush=True)

    trainer = Trainer(cfg)
    # Abstract restore template (no init compile — orbax needs only
    # shapes/dtypes/structure; the real arrays come from the checkpoint).
    state = jax.eval_shape(
        lambda k: trainer.init_state(k), jax.random.PRNGKey(0)
    )
    manager = CheckpointManager(f"{exp_dir}/checkpoints")
    steps = [s for s in manager.all_steps() if s % every == 0]
    print(f"checkpoints (every {every}): {steps}", flush=True)

    feature_fn = make_feature_fn(fixed_params())
    res = cfg.image_size // 16

    # Real stream: the training distribution itself (synthetic_device
    # batches, same family/seed-space the run trained on), clamped like
    # the fakes so both streams share the extractor's input contract.
    def real_batches(key):
        for i in range(0, n_sample, batch):
            key, k = jax.random.split(key)
            yield jnp.clip(
                synthetic_batch(k, batch, cfg.image_size, 0, family), -1, 1)

    hide = trainer._hide_fn(sigma=1, delta=0.5)

    def fake_batches(ema, key):
        for i in range(0, n_sample, batch):
            key, k1, k2, k3 = jax.random.split(key, 4)
            msg = jax.random.bernoulli(
                k1, 0.5, (batch, cfg.N * res * res)).astype(jnp.float32)
            t2 = jax.random.uniform(
                k2, (batch, cfg.texture_channel), jnp.float32, -1.0, 1.0)
            img, _ = hide(ema, msg, t2, k3)
            yield jnp.clip(img, -1, 1)

    t0 = time.time()
    real = extract_features(feature_fn, real_batches(jax.random.PRNGKey(7)),
                            n_sample)
    mu_r, sig_r = compute_stats(real)
    print(f"real stats: {real.shape} in {time.time()-t0:.0f}s", flush=True)

    rows = []
    for step in steps:
        state = manager.restore(state, step)
        t0 = time.time()
        fake = extract_features(
            feature_fn, fake_batches(state.ema, jax.random.PRNGKey(11)),
            n_sample)
        fid = fid_from_stats(mu_r, sig_r, *compute_stats(fake))
        rows.append((step, fid))
        print(json.dumps({"iter": step, "relative_fid": round(fid, 4),
                          "secs": round(time.time() - t0, 1)}), flush=True)

    print("\niter      relative FID (fixed_params extractor)")
    for step, fid in rows:
        print(f"{step:>7d}   {fid:.4f}")
    print("FID_TRAJECTORY_OK")


if __name__ == "__main__":
    main()
