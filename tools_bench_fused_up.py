"""Microbench: fused phase-upsample conv vs conv_transpose+blur on TPU.

Times (a) the IDEAS generator forward at the bench config and (b) the
full training step, with ideas_tpu.ops.phase_upsample toggled off/on.
One process, compiles chained (remote compile is the dominant cost).

Usage: python tools_bench_fused_up.py [--step]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def force(x):
    # block_until_ready is a no-op on the axon relay; chain a scalar fetch.
    return float(jax.device_get(jnp.sum(x.astype(jnp.float32))))


def time_fn(fn, *args, iters=20):
    force(fn(*args))  # compile + warm
    force(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    force(out)
    return (time.perf_counter() - t0) / iters


def bench_generator(batch=24, dtype=jnp.bfloat16):
    from ideas_tpu.models import init_model
    from ideas_tpu.config import TrainConfig
    from ideas_tpu.ops import phase_upsample

    cfg = TrainConfig(image_size=256, channel=32, compute_dtype=dtype)
    g = init_model("Generator", cfg)
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.normal(size=(batch, 16, 16, 8)), dtype)
    t = jnp.asarray(rng.normal(size=(batch, 2048)), dtype)
    params = jax.jit(g.init)(jax.random.PRNGKey(0), s, t)

    results = {}
    for enabled in (False, True):
        phase_upsample.set_enabled(enabled)

        @jax.jit
        def fwd(p, s, t):
            return g.apply(p, s, t)

        dt = time_fn(fwd, params, s, t)
        results[enabled] = dt
        print(f"G fwd (B={batch}) fused={enabled}: {dt*1e3:.2f} ms", flush=True)

        @jax.jit
        def fwdbwd(p, s, t):
            return jax.grad(lambda pp: jnp.mean(g.apply(pp, s, t) ** 2).astype(jnp.float32))(p)

        dt2 = time_fn(lambda *a: jax.tree_util.tree_leaves(fwdbwd(*a))[0], params, s, t)
        print(f"G fwd+bwd (B={batch}) fused={enabled}: {dt2*1e3:.2f} ms", flush=True)
    print(f"G forward speedup: {results[False]/results[True]:.3f}x", flush=True)


def bench_step(batch=8, dtype=jnp.bfloat16):
    from ideas_tpu.config import TrainConfig
    from ideas_tpu.train import Trainer
    from ideas_tpu.ops import phase_upsample

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (batch, 256, 256, 3)), jnp.float32)
    for enabled in (False, True):
        phase_upsample.set_enabled(enabled)
        cfg = TrainConfig(image_size=256, channel=32, batch_size=batch,
                          compute_dtype=dtype)
        trainer = Trainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        step = trainer.train_step_fn(do_r1=False, donate=False)

        def run(state, x):
            st, m = step(state, x)
            return m["Loss_total"]

        dt = time_fn(run, state, x)
        print(f"full step (B={batch}, no R1) fused={enabled}: {dt*1e3:.2f} ms "
              f"= {batch/dt:.2f} imgs/s", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--step", action="store_true")
    ap.add_argument("--batch", type=int, default=24)
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)
    if args.step:
        bench_step()
    else:
        bench_generator(batch=args.batch)
