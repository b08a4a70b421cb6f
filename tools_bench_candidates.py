"""Round-2 perf candidates, measured on the real chip in ONE process
(dev tool; results recorded in PERF.md):

  1. Pallas fused blur+demod+bias+lrelu epilogue vs the XLA composition
     (two depthwise convs + fused elementwise), at the generator
     up-path shapes.
  2. Batch scaling with rematerialization: full train step imgs/s at
     batch 8 (remat off), 16 (off), 32 (remat on — without it batch 32
     OOMs, PERF.md "Batch scaling").
  3. One-program step vs split D-phase/G-phase programs (validates the
     single-XLA-program design with a measurement).

Timing discipline: force execution with a dependent-scalar fetch
(`jax.block_until_ready` is a no-op on the relay backend).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def force(out):
    return float(jax.device_get(
        jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32))))


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    force(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def bench_epilogue():
    from ideas_tpu.ops.pallas_blur import blur2d_bias_act_pallas
    from ideas_tpu.ops.upfirdn2d import upfirdn2d

    print("== candidate 1: fused blur+demod+bias+lrelu epilogue", flush=True)
    taps = tuple(t / 8.0 for t in (1.0, 3.0, 3.0, 1.0))
    pad = (2, 1)  # the k=3 up-path blur pads
    rng = np.random.default_rng(0)
    # generator up-path shapes at 256^2 / channel 32 / 3B=24
    for shape in [(24, 64, 64, 512), (24, 128, 128, 512),
                  (24, 256, 256, 256)]:
        n, h, w, c = shape
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32)).astype(jnp.bfloat16)
        scale = jnp.asarray(rng.standard_normal((n, c)).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal((c,)).astype(np.float32))

        @jax.jit
        def xla_path(x, scale, bias):
            y = upfirdn2d(x, jnp.asarray(taps, x.dtype), up=1, down=1, pad=pad)
            y = y * scale[:, None, None, :].astype(y.dtype) + bias.astype(y.dtype)
            return jnp.where(y >= 0, y, 0.2 * y) * np.float32(np.sqrt(2.0))

        pallas_path = jax.jit(
            lambda x, scale, bias: blur2d_bias_act_pallas(
                x, scale, bias, taps, taps, pad))

        a = timeit(f"XLA blur+epilogue    {shape}", xla_path, x, scale, bias)
        b = timeit(f"Pallas fused         {shape}", pallas_path, x, scale, bias)
        print(f"  -> pallas/xla = {b / a:.2f}x", flush=True)


def bench_batch_remat():
    from ideas_tpu.config import TrainConfig
    from ideas_tpu.train import Trainer

    print("== candidate 2: batch scaling + remat", flush=True)
    rng = np.random.default_rng(0)
    for batch, remat in ((8, False), (16, False), (32, True)):
        cfg = TrainConfig(image_size=256, channel=32, batch_size=batch,
                          compute_dtype=jnp.bfloat16, remat=remat)
        tr = Trainer(cfg)
        state = tr.init_state(jax.random.PRNGKey(0))
        x = jnp.asarray(
            rng.uniform(-1, 1, (batch, 256, 256, 3)).astype(np.float32))
        step = tr.train_step_fn(do_r1=False)
        try:
            def run(state, x):
                s2, m = step(state, x, jax.random.PRNGKey(1))
                return m["Loss_total"]

            dt = timeit(f"step b={batch} remat={int(remat)}", run, state, x,
                        iters=5)
            print(f"  -> {batch / dt:.1f} imgs/s", flush=True)
        except Exception as e:  # OOM etc. — record, keep going
            print(f"  b={batch} remat={int(remat)} FAILED: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
        del tr, state, step


def bench_r1_overlap_bound():
    """Candidate 'R1-phase overlap / scheduling': measure the amortized
    R1 overhead. An async/stale-R1 scheme (running the regularizer
    concurrently with later steps) can recover AT MOST this overhead —
    if the bound is sub-1%, the semantic divergence from the reference's
    synchronous R1 can't pay for itself."""
    from ideas_tpu.config import TrainConfig
    from ideas_tpu.train import Trainer

    print("== candidate 3: R1 scheduling bound", flush=True)
    cfg = TrainConfig(image_size=256, channel=32, batch_size=8,
                      compute_dtype=jnp.bfloat16)
    tr = Trainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (8, 256, 256, 3)).astype(np.float32))

    plain = tr.train_step_fn(do_r1=False)
    r1 = tr.train_step_fn(do_r1=True)
    tp = timeit("step (no R1)", lambda s, x: plain(
        s, x, jax.random.PRNGKey(1))[1]["Loss_total"], state, x, iters=5)
    tr1 = timeit("step (R1)", lambda s, x: r1(
        s, x, jax.random.PRNGKey(1))[1]["Loss_total"], state, x, iters=5)
    k = cfg.d_reg_every
    overhead = (tr1 - tp) / ((k - 1) * tp + tr1)
    print(f"  -> amortized R1 overhead (1/{k}): {overhead * 100:.2f}% — "
          "the ceiling for any async-R1 scheduling win", flush=True)


def bench_share_noise():
    """Candidate 4: share one noise draw between the D and G phases so
    XLA CSE merges the duplicated generator forward (default-off
    `share_phase_noise` flag; the reference re-samples per phase)."""
    from ideas_tpu.config import TrainConfig
    from ideas_tpu.train import Trainer

    print("== candidate 4: share_phase_noise (CSE the dup G forward)",
          flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (8, 256, 256, 3)).astype(np.float32))
    for share in (False, True):
        cfg = TrainConfig(image_size=256, channel=32, batch_size=8,
                          compute_dtype=jnp.bfloat16,
                          share_phase_noise=share)
        tr = Trainer(cfg)
        state = tr.init_state(jax.random.PRNGKey(0))
        step = tr.train_step_fn(do_r1=False)

        def run(state, x):
            s2, m = step(state, x, jax.random.PRNGKey(1))
            return m["Loss_total"]

        dt = timeit(f"step share_phase_noise={int(share)}", run, state, x,
                    iters=10)
        print(f"  -> {8 / dt:.1f} imgs/s", flush=True)
        del tr, state, step


def main():
    import sys

    cands = {"epilogue": bench_epilogue, "batch": bench_batch_remat,
             "r1": bench_r1_overlap_bound, "share": bench_share_noise}
    # Run one candidate per process when named (HBM from a failed larger
    # config otherwise poisons the next candidate); default = all.
    picked = [cands[a] for a in sys.argv[1:]] or list(cands.values())
    print(f"backend: {jax.devices()}", flush=True)
    for cand in picked:
        try:
            cand()
        except Exception as e:  # record the failure, keep measuring
            print(f"{cand.__name__} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
    print("BENCH_CANDIDATES_OK", flush=True)


if __name__ == "__main__":
    main()
