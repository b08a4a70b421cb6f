"""Gate wall-time probe: where do the dryrun_multichip minutes go?

Round-3 verdict: the driver's multi-chip gate budget is ~600 s and the
honest gate wall time was ~19.5 min. Round-4 instrumentation shows the
EXECUTION of one tiny train step on the 8-thread-device CPU backend is
the dominant phase (785 s under contention; compile only ~140 s cold).
This probe runs one configuration per process and prints phase timings
plus collective counts from the compiled HLO, so flag/shape variants
can be A/B'd.

Usage (parent sets nothing; the probe re-execs itself with the child
env, mirroring __graft_entry__.dryrun_multichip):

    /opt/venv/bin/python tools_gate_probe.py \
        --n_devices 8 --spatial 2 --r1 1 --extra_flags "..." [--tag x]
"""

import argparse
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.abspath(__file__))


def child(args):
    import time

    t0 = time.time()

    def phase(name):
        print(f"PROBE {args.tag} {name} t={time.time() - t0:.1f}s", flush=True)

    import jax
    import numpy as np

    from ideas_tpu import parallel
    from ideas_tpu.config import tiny_config
    from ideas_tpu.train import Trainer

    phase("imports")
    devices = jax.devices()[: args.n_devices]
    mesh = parallel.make_mesh(devices=devices, spatial_devices=args.spatial)
    cfg = tiny_config(
        batch_size=args.n_devices, image_size=64, channel=4,
        texture_channel=64, n_crop=1, ref_crop=1,
    )
    trainer = Trainer(cfg, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    jax.block_until_ready(state)
    phase("init_state")
    x = parallel.shard_batch(
        mesh,
        np.random.default_rng(0)
        .uniform(-1, 1, (cfg.batch_size, cfg.image_size, cfg.image_size, 3))
        .astype(np.float32),
    )
    step = trainer.train_step_fn(do_r1=bool(args.r1))
    lowered = step.lower(state, x, jax.random.PRNGKey(1))
    phase("trace+lower")
    compiled = lowered.compile()
    phase("compile")
    hlo = compiled.as_text()
    for op in ("all-reduce", "collective-permute", "all-gather",
               "reduce-scatter", "convolution"):
        print(f"PROBE {args.tag} hlo {op}: {hlo.count(op)}", flush=True)
    del hlo
    state2, metrics = compiled(state, x, jax.random.PRNGKey(1))
    jax.block_until_ready(state2)
    phase("execute1")
    state3, _ = compiled(state2, x, jax.random.PRNGKey(2))
    jax.block_until_ready(state3)
    phase("execute2")
    print(f"PROBE {args.tag} OK", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_devices", type=int, default=8)
    ap.add_argument("--spatial", type=int, default=2)
    ap.add_argument("--r1", type=int, default=1)
    ap.add_argument("--extra_flags", default="")
    ap.add_argument("--tag", default="probe")
    ap.add_argument("--child", action="store_true")
    args = ap.parse_args()
    if args.child:
        import jax

        jax.config.update("jax_platforms", "cpu")
        child(args)
        return
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.n_devices} "
        "--xla_cpu_collective_call_terminate_timeout_seconds=900 "
        "--xla_cpu_collective_timeout_seconds=900 "
        + args.extra_flags
    ).strip()
    rc = subprocess.run(
        [sys.executable, __file__, "--child"] + sys.argv[1:], cwd=_REPO,
        env=env,
    ).returncode
    sys.exit(rc)


if __name__ == "__main__":
    main()
