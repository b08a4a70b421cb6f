"""Benchmark: 256^2 IDEAS training throughput (G+D step) on one TPU chip.

Measures the steady-state full training iteration — both GAN phases,
three optimizers, EMA, amortized R1 every d_reg_every=16 — at the paper
config (256^2, channel=32, N=1), and prints ONE JSON line:

    {"metric": "...", "value": imgs_per_sec, "unit": "imgs/sec/chip",
     "vs_baseline": value / (3 * REF_2080TI_IMGS_PER_SEC)}

Baseline: the reference publishes no throughput (BASELINE.md); the
north-star target is 3x an RTX 2080Ti running the reference trainer.
REF_2080TI_IMGS_PER_SEC below is our documented estimate for the
reference's `train.py` (batch 1..8, six generator forwards + three
discriminators per iteration on an 11 GB 2080Ti).

The step runs with `share_phase_noise` (BENCH_SHARE=0 reverts): one
noise draw serves both GAN phases so XLA CSE merges the duplicated
generator forward — +9.6% step throughput with training quality
verified unchanged by a 128^2/6k A/B (PERF.md candidate ledger 4 and
the datapoints table).
"""

import json
import os
import sys
import time

REF_2080TI_IMGS_PER_SEC = 10.0  # documented estimate (see module docstring)
TARGET = 3.0 * REF_2080TI_IMGS_PER_SEC


def main():
    import jax
    import numpy as np

    from ideas_tpu.config import TrainConfig
    from ideas_tpu.train import Trainer

    batch = int(os.environ.get("BENCH_BATCH", "8"))
    iters = int(os.environ.get("BENCH_ITERS", "32"))
    dtype = os.environ.get("BENCH_DTYPE", "bf16")
    import jax.numpy as jnp

    cfg = TrainConfig(
        image_size=256,
        channel=32,
        batch_size=batch,
        compute_dtype=jnp.bfloat16 if dtype == "bf16" else jnp.float32,
        share_phase_noise=os.environ.get("BENCH_SHARE", "1") == "1",
    )
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    x = jax.device_put(
        np.random.default_rng(0)
        .uniform(-1, 1, (batch, 256, 256, 3))
        .astype(np.float32)
    )
    step_plain = trainer.train_step_fn(do_r1=False, donate=True)
    step_r1 = trainer.train_step_fn(do_r1=True, donate=True)

    def sync(m):
        # device_get of a scalar forces execution of the whole chained
        # program graph; block_until_ready alone is unreliable on
        # remote-dispatch backends.
        return float(jax.device_get(m["Loss_total"]))

    # Warmup/compile both variants.
    for i in range(2):
        state, m = step_plain(state, x)
    state, m = step_r1(state, x)
    sync(m)

    # Timed: amortized 16-iter cadence (15 plain + 1 R1 per cycle).
    # Steps chain through `state`, so the final fetch forces all of them;
    # RNG evolves inside the compiled step (no host RNG round trips).
    t0 = time.time()
    n = 0
    for i in range(iters):
        fn = step_r1 if (i + 1) % cfg.d_reg_every == 0 else step_plain
        state, m = fn(state, x)
        n += batch
    sync(m)
    dt = time.time() - t0

    imgs_per_sec = n / dt
    print(
        json.dumps(
            {
                "metric": "256^2 imgs/sec/chip (full G+D train step, amortized R1)",
                "value": round(imgs_per_sec, 2),
                "unit": "imgs/sec/chip",
                "vs_baseline": round(imgs_per_sec / TARGET, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
