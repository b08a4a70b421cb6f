"""Benchmark: 256^2 IDEAS training throughput (G+D step) on one TPU chip.

Measures the steady-state full training iteration — both GAN phases,
three optimizers, EMA, amortized R1 every d_reg_every=16 — at the paper
config (256^2, channel=32, N=1), and prints ONE JSON line:

    {"metric": "...", "value": imgs_per_sec, "unit": "imgs/sec/chip",
     "vs_baseline": value / (3 * REF_2080TI_IMGS_PER_SEC), ...}

Baseline: the reference publishes no throughput (BASELINE.md); the
north-star target is 3x an RTX 2080Ti running the reference trainer.
REF_2080TI_IMGS_PER_SEC below is our documented estimate for the
reference's `train.py` (batch 1..8, six generator forwards + three
discriminators per iteration on an 11 GB 2080Ti).

Two variants are measured in one process (BENCH_BOTH=0 skips the
second):

* `value` (headline): `share_phase_noise` on — one noise draw serves
  both GAN phases so XLA CSE merges the duplicated generator forward.
  Quality A/B-verified at 128^2/6k; the round-3 80k paper-budget run
  trains with the flag (its final-eval sweep in PERF.md is the
  256^2-at-budget quality evidence).
* `value_reference_semantics`: share off — noise re-sampled per phase
  exactly like the reference (`train.py:60-64,148-152`), for an
  apples-to-apples algorithmic comparison.
"""

import json
import os
import sys
import time

REF_2080TI_IMGS_PER_SEC = 10.0  # documented estimate (see module docstring)
TARGET = 3.0 * REF_2080TI_IMGS_PER_SEC


def measure(share: bool, batch: int, iters: int, dtype):
    import jax
    import numpy as np

    from ideas_tpu.config import TrainConfig
    from ideas_tpu.train import Trainer

    cfg = TrainConfig(
        image_size=256,
        channel=32,
        batch_size=batch,
        compute_dtype=dtype,
        share_phase_noise=share,
        # Exact-parity optimizer-state compaction (optax.adam b1=0 update
        # sequence, tests/test_optim.py) — +0.7% measured, PERF.md round-3
        # ledger #5. Applies to BOTH variants: it does not change the
        # algorithm, so the reference-semantics line stays apples-to-apples.
        compact_adam=os.environ.get("BENCH_COMPACT_ADAM", "1") == "1",
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
    del state  # free HBM before the next variant initializes
    return n / dt


def main():
    import jax.numpy as jnp

    batch = int(os.environ.get("BENCH_BATCH", "8"))
    iters = int(os.environ.get("BENCH_ITERS", "32"))
    dtype = (jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16"
             else jnp.float32)
    both = os.environ.get("BENCH_BOTH", "1") == "1"

    shared = measure(share=True, batch=batch, iters=iters, dtype=dtype)
    out = {
        "metric": "256^2 imgs/sec/chip (full G+D train step, amortized R1)",
        "value": round(shared, 2),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(shared / TARGET, 3),
    }
    if both:
        ref_sem = measure(share=False, batch=batch, iters=iters, dtype=dtype)
        out["value_reference_semantics"] = round(ref_sem, 2)
        out["vs_baseline_reference_semantics"] = round(ref_sem / TARGET, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
