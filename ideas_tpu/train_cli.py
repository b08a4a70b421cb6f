"""Training CLI driver — parity with `/root/reference/train.py:325-476`.

    python -m ideas_tpu.train_cli --exp_name bedroom --dataset_type lmdb \
        --dataset_path data/bedroom --num_iters 80000

Produces the same artifacts as the reference: experiments/<exp>/
{training_config.txt, training_logs.txt, samples/NNNNNNN.png,
checkpoints/}. Adds TPU-native behavior: one jitted program per
iteration, data-parallel sharding over all visible chips, orbax
checkpoints, host-side prefetching data pipeline.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ideas_tpu import parallel
from ideas_tpu.checkpoint import CheckpointManager
from ideas_tpu.config import TrainConfig
from ideas_tpu.data import make_dataset, data_iterator
from ideas_tpu.train import Trainer
from ideas_tpu.utils import save_image_grid, time_change


def parse_args(argv=None) -> TrainConfig:
    p = argparse.ArgumentParser(description=__doc__)
    defaults = TrainConfig()
    p.add_argument("--exp_name", type=str, required=True)
    p.add_argument("--dataset_path", type=str, default="")
    p.add_argument("--dataset_type",
                   choices=["lmdb", "normal", "synthetic", "synthetic_device"],
                   default="synthetic")
    p.add_argument("--num_iters", type=int, required=True)
    for name in ("N", "batch_size", "image_size", "ref_crop", "n_crop",
                 "d_reg_every", "channel", "channel_multiplier",
                 "structure_channel", "texture_channel", "log_every",
                 "show_every", "save_every", "seed", "num_spatial_devices"):
        p.add_argument(f"--{name}", type=int, default=getattr(defaults, name))
    for name in ("lambda_Ex", "lr", "real_r1", "texture_r1", "dist_r1",
                 "ex_margin"):
        p.add_argument(f"--{name}", type=float, default=getattr(defaults, name))
    p.add_argument("--synthetic_family", choices=["default", "rich"],
                   default=defaults.synthetic_family,
                   help="on-device synthetic image family "
                        "(rich = higher structure entropy)")
    p.add_argument("--share_phase_noise", action="store_true",
                   help="one noise draw serves both GAN phases (XLA CSEs "
                        "the duplicated generator forward; see PERF.md)")
    p.add_argument("--compact_adam", action="store_true",
                   help="second-moment-only Adam states (exact for b1=0; "
                        "2x less optimizer HBM — see ideas_tpu/optim.py). "
                        "Must match between a run and its resume.")
    p.add_argument("--adam_nu_dtype", choices=["float32", "bfloat16"],
                   default=defaults.adam_nu_dtype,
                   help="compact-Adam second-moment storage dtype")
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--experiments_dir", type=str, default=defaults.experiments_dir)
    p.add_argument("--bf16", action="store_true", help="bfloat16 compute")
    p.add_argument("--platform", type=str, default=None,
                   help="force a JAX platform (e.g. cpu) before backend init")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax.profiler trace of iters 10-15 here")
    p.add_argument("--keep_checkpoints", type=int, default=5,
                   help="checkpoint rotation depth (0 = keep all; used "
                        "for post-hoc metric trajectories over a run)")
    a = p.parse_args(argv)
    if a.synthetic_family != "default" and a.dataset_type != "synthetic_device":
        p.error("--synthetic_family is only consulted by "
                "--dataset_type synthetic_device (the host 'synthetic' "
                "dataset has no family parameter); refusing to record a "
                "family the run would not actually use")
    if a.platform:
        import jax

        jax.config.update("jax_platforms", a.platform)
    kw = {f.name: getattr(a, f.name) for f in dataclasses.fields(TrainConfig)
          if hasattr(a, f.name)}
    cfg = TrainConfig(**kw)
    if a.bf16:
        cfg = cfg.replace(compute_dtype=jnp.bfloat16)
    cfg.profile_dir = a.profile_dir  # transient, not part of the dataclass
    cfg.keep_checkpoints = a.keep_checkpoints  # transient, like profile_dir
    return cfg


def main(cfg: TrainConfig) -> None:
    parallel.maybe_initialize_distributed()
    base_dir = os.path.join(cfg.experiments_dir, cfg.exp_name)
    ckpt_dir = os.path.join(base_dir, "checkpoints")
    sample_dir = os.path.join(base_dir, "samples")
    os.makedirs(ckpt_dir, exist_ok=True)
    os.makedirs(sample_dir, exist_ok=True)

    with open(os.path.join(base_dir, "training_config.txt"), "w") as fp:
        for field in dataclasses.fields(cfg):
            fp.write(f"{field.name}: {getattr(cfg, field.name)}\n")
    # Append-only (like the reference's training_logs.txt): restarts —
    # e.g. by tools/supervise.py after a relay stall — keep the history.
    log_path = os.path.join(base_dir, "training_logs.txt")
    # Structured experiment tracking (the reference's wandb side channel,
    # `/root/reference/stylegan2/train.py:296-310`, without a server):
    # one JSON object per event, machine-readable for plotting/analysis.
    metrics_path = os.path.join(base_dir, "metrics.jsonl")

    def log(msg: str):
        print(msg, flush=True)
        with open(log_path, "a") as fp:
            fp.write(msg + "\n")

    def log_metrics(event: str, iter_idx: int, values: dict):
        import math

        rec = {"event": event, "iter": iter_idx, "time": time.time()}
        # NaN/Inf are not valid JSON (a diverged GAN loss would corrupt
        # the whole file for strict parsers) — encode them as null.
        rec.update({k: (float(v) if math.isfinite(float(v)) else None)
                    for k, v in values.items()})
        with open(metrics_path, "a") as fp:
            fp.write(json.dumps(rec, allow_nan=False) + "\n")

    mesh = parallel.make_mesh(cfg.num_data_devices,
                              spatial_devices=cfg.num_spatial_devices)
    n_data = mesh.shape[parallel.DATA_AXIS]
    if cfg.batch_size % n_data != 0:
        raise ValueError(
            f"batch_size {cfg.batch_size} not divisible by {n_data} "
            f"data-parallel devices"
        )
    log(f"devices: {mesh.devices.size} x {jax.devices()[0].device_kind} "
        f"(mesh {dict(mesh.shape)}); global batch {cfg.batch_size}")

    trainer = Trainer(cfg, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(cfg.seed))
    keep = getattr(cfg, "keep_checkpoints", 5)
    manager = CheckpointManager(ckpt_dir, max_to_keep=(None if keep == 0 else keep))
    start_iter = 0
    if cfg.ckpt is not None or manager.latest_step() is not None:
        step = int(cfg.ckpt) if cfg.ckpt else manager.latest_step()
        state = manager.restore(state, step)
        start_iter = int(jax.device_get(state.step))
        log(f"resumed from checkpoint at iter {start_iter}")

    device_data = cfg.dataset_type == "synthetic_device"
    if device_data:
        # Batches are rasterized inside the compiled step (zero transfer;
        # see data/device_synthetic.py). A jitted sampler still provides
        # device-resident eval/sample batches every show_every iters.
        from ideas_tpu.data.device_synthetic import (
            make_device_data_fn, synthetic_batch,
        )

        loader = None
        data_fn = make_device_data_fn(cfg.batch_size, cfg.image_size,
                                      family=cfg.synthetic_family)
        step_plain = trainer.train_step_fn(
            do_r1=False, donate=True, device_data_fn=data_fn)
        step_r1 = trainer.train_step_fn(
            do_r1=True, donate=True, device_data_fn=data_fn)
    else:
        # Host datasets ship raw uint8 + a flip mask; normalize/flip run
        # on device inside the step (4x fewer bytes over the relay link,
        # PERF.md). The *next* batch is device_put right after the step
        # dispatch so the transfer overlaps device compute.
        dataset = make_dataset(cfg.dataset_type, cfg.dataset_path, cfg.image_size)
        loader = data_iterator(dataset, cfg.batch_size, seed=cfg.seed, raw=True)
        step_plain = trainer.train_step_uint8_fn(do_r1=False, donate=True)
        step_r1 = trainer.train_step_uint8_fn(do_r1=True, donate=True)

        @jax.jit
        def to_float(u8, flips):
            xf = u8.astype(jnp.float32) / 127.5 - 1.0
            return jnp.where(flips[:, None, None, None],
                             xf[:, :, ::-1, :], xf)

        def put_next():
            u8, flips = next(loader)
            return (parallel.shard_batch(mesh, u8),
                    parallel.shard_batch(mesh, flips))

        pending = put_next()
    key = jax.random.PRNGKey(cfg.seed + 1)

    profile_dir = getattr(cfg, "profile_dir", None)
    start_time = time.time()
    window_t0, window_imgs = start_time, 0
    metrics = {}
    for idx in range(1, cfg.num_iters + 1):
        iter_idx = idx + start_iter
        if iter_idx > cfg.num_iters:
            log("Done!")
            break
        if profile_dir and idx == 10:
            jax.profiler.start_trace(profile_dir)
        fn = step_r1 if iter_idx % cfg.d_reg_every == 0 else step_plain
        if device_data:
            state, metrics = fn(state)  # batch + RNG both inside the step
            x = None
        else:
            u8, flips = pending
            state, metrics = fn(state, u8, flips)  # RNG evolves inside
            pending = put_next()  # transfer overlaps device compute
            x = (u8, flips)  # materialized lazily for eval/samples below
        window_imgs += cfg.batch_size
        if profile_dir and idx == 15:
            jax.block_until_ready(metrics)
            jax.profiler.stop_trace()
            log(f"profiler trace written to {profile_dir}")

        if iter_idx % cfg.log_every == 0:
            m = {k: float(v) for k, v in jax.device_get(metrics).items()}
            now = time.time()
            used = now - start_time
            rest = used / idx * (cfg.num_iters - iter_idx)
            ips = window_imgs / max(now - window_t0, 1e-9)
            window_t0, window_imgs = now, 0
            log(
                f"[{iter_idx:07d}/{cfg.num_iters:07d}] "
                f"Total: {m['Loss_total']:.4f}; "
                f"G,rec: {m['G_rec_loss']:.4f}; "
                f"G,texture: {m['G_texture_loss']:.4f}; "
                f"G,real: {m['G_real_loss']:.4f}; "
                f"E,dist: {m['E_dist_loss']:.4f}; "
                f"E,stru: {m['E_stru_loss']:.4f}; "
                f"Ex: {m['Ex_loss']:.4f} "
                f"({ips:.1f} imgs/s) "
                f"used time: {time_change(used)}; "
                f"rest time: {time_change(rest)}"
            )
            log_metrics("train", iter_idx, {**m, "imgs_per_sec": ips})

        if iter_idx % cfg.show_every == 0:
            key, k1, k2 = jax.random.split(key, 3)
            if device_data:
                key, kx = jax.random.split(key)
                x = synthetic_batch(kx, cfg.batch_size, cfg.image_size,
                                    0, cfg.synthetic_family)
            else:
                x = to_float(*x)
            ev = {k: float(v) for k, v in
                  jax.device_get(trainer.eval_roundtrip(state, k1, x)).items()}
            use_x3 = 3 if iter_idx > cfg.num_iters * 0.8 else 2
            log(
                f"[Testing {iter_idx:07d}/{cfg.num_iters:07d}] sigma=1 "
                f"delta=50% using synthesised image hatX_{use_x3} "
                f"ACC of Msg: {ev['ACC']:.4f}; "
                f"L1 loss of tensor: {ev['tensor_L1']:.4f}"
            )
            log_metrics("eval", iter_idx, ev)
            _save_samples(trainer, state, x, k2, sample_dir, iter_idx, cfg)

        if iter_idx % cfg.save_every == 0 or iter_idx == cfg.num_iters:
            manager.save(iter_idx, jax.device_get(state))
            log(f"Checkpoint saved at iter {iter_idx}")


def _save_samples(trainer, state, x, key, sample_dir, iter_idx, cfg):
    """Sample grid: rows X, X1_hat, X2_hat, X3_hat (train.py:295-303)."""
    hx1, hx2, hx3 = jax.device_get(trainer.sample_images(state, x, key))
    grid = np.concatenate([jax.device_get(x), hx1, hx2, hx3], axis=0)
    save_image_grid(
        grid, os.path.join(sample_dir, f"{iter_idx:07d}.png"), nrow=x.shape[0]
    )


if __name__ == "__main__":
    main(parse_args())
