"""Component-level timing on the real chip (dev tool, not shipped API).

Times each piece of the 256^2 train step with forced materialization to
find where the milliseconds go.

    python tools_profile_components.py [share=1] [compact=1]

Defaults profile the ADOPTED headline config (share_phase_noise +
compact Adam — the round-3 bench recipe); pass share=0 / compact=0 for
the reference-semantics control.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ideas_tpu.config import TrainConfig
from ideas_tpu.losses import patchify_image
from ideas_tpu.train import Trainer


def _argv_flag(name, default):
    for tok in sys.argv[1:]:
        if tok.startswith(name + "="):
            return bool(int(tok.split("=", 1)[1]))
    return default


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    _ = float(jax.device_get(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _i in range(iters):
        out = fn(*args)
    _ = float(jax.device_get(jax.tree.leaves(out)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt * 1e3:8.2f} ms")
    return dt


def main():
    b = 8
    share = _argv_flag("share", True)
    compact = _argv_flag("compact", True)
    print(f"config: share_phase_noise={share} compact_adam={compact}")
    cfg = TrainConfig(image_size=256, channel=32, batch_size=b,
                      compute_dtype=jnp.bfloat16,
                      share_phase_noise=share, compact_adam=compact)
    tr = Trainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0))
    p = state.params
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (b, 256, 256, 3)).astype(np.float32))
    res = 16
    s = jnp.asarray(rng.uniform(-1, 1, (3 * b, res, res, 8)).astype(np.float32))
    t = jnp.asarray(rng.uniform(-1, 1, (3 * b, 2048)).astype(np.float32))
    key = jax.random.PRNGKey(1)

    G, E, Dreal, Dco, Ddist = (tr.models[k] for k in
                               ("G", "E", "Dreal", "Dco", "Ddist"))

    g_fwd = jax.jit(lambda s, t: G.apply(p["G"], s, t))
    timeit("G fwd (3B)", g_fwd, s, t)

    g_loss = jax.jit(jax.grad(
        lambda gp, s, t: jnp.sum(jnp.abs(G.apply(gp, s, t)))))
    timeit("G fwd+bwd (3B)", g_loss, p["G"], s, t)

    e_fwd = jax.jit(lambda x: E.apply(p["E"], x))
    timeit("E fwd (B)", e_fwd, x)

    d_fwd = jax.jit(lambda x: Dreal.apply(p["Dreal"], x))
    x3 = jnp.concatenate([x, x, x], 0)
    timeit("Dreal fwd (3B)", d_fwd, x3)

    patch = jax.jit(lambda k, img: patchify_image(k, img, cfg.n_crop))
    timeit("patchify (B, 8 crops)", patch, key, x)

    ref_patch = patchify_image(key, x, cfg.ref_crop * cfg.n_crop)
    fp = patchify_image(key, x, cfg.n_crop)
    dco = jax.jit(lambda a, r: Dco.apply(p["Dco"], a, r, cfg.ref_crop)[0])
    timeit("Dco fwd (patches)", dco, fp, ref_patch)

    step = tr.train_step_fn(do_r1=False)
    timeit("full step (no R1)", step, state, x, key, iters=5)
    step_r1 = tr.train_step_fn(do_r1=True)
    timeit("full step (R1)", step_r1, state, x, key, iters=5)


if __name__ == "__main__":
    main()
