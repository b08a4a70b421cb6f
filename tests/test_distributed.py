"""Executed multi-process `jax.distributed` smoke test.

The reference's DDP path is actually launchable (NCCL env:// init,
`/root/reference/stylegan2/train.py:370-373,425-438`, helpers
`stylegan2/distributed.py:9-41`); this is the TPU-native framework's
executed equivalent: two REAL OS processes, a local coordinator,
`parallel.maybe_initialize_distributed()` from env vars (the env://
analogue), and one cross-process psum over the gloo CPU collectives
backend, asserted in both ranks.

Run as subprocesses because each rank needs its own fresh backend —
this file's own process already holds the single-process CPU backend
set up by conftest.py.
"""

import os
import socket
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import os, sys
import jax

# Explicit config.update: sitecustomize force-registers the axon TPU
# relay regardless of JAX_PLATFORMS in the env (see tests/conftest.py).
jax.config.update("jax_platforms", "cpu")

from ideas_tpu import parallel

ok = parallel.maybe_initialize_distributed()
assert ok, "coordinator env vars set but initialize() was not attempted"
assert jax.process_count() == 2, jax.process_count()
pid = jax.process_index()

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

mesh = Mesh(np.asarray(jax.devices()), ("data",))
# One global (2,) array, one element per process.
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), np.array([float(pid + 1)]), (2,)
)
f = jax.jit(
    shard_map(lambda x: jax.lax.psum(x, "data"), mesh=mesh,
              in_specs=P("data"), out_specs=P())
)
out = float(jax.device_get(f(arr))[0])
assert out == 3.0, out  # 1.0 + 2.0 summed across the two processes
print(f"PSUM_OK rank={pid} out={out}", flush=True)
"""


_TRAIN_CHILD = r"""
import os, sys
import jax

jax.config.update("jax_platforms", "cpu")

from ideas_tpu import parallel

ok = parallel.maybe_initialize_distributed()
assert ok, "coordinator env vars set but initialize() was not attempted"
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()  # 2 procs x 2 virtual devices
pid = jax.process_index()

import numpy as np
import jax.numpy as jnp
from ideas_tpu.config import tiny_config
from ideas_tpu.train import Trainer

mesh = parallel.make_mesh()  # 1-D data mesh over the 4 GLOBAL devices
cfg = tiny_config(batch_size=4, channel=4, n_crop=1, ref_crop=1)
trainer = Trainer(cfg, mesh=mesh)
state = trainer.init_state(jax.random.PRNGKey(0))

# Each process contributes its LOCAL half of the global batch (the DDP
# per-rank data-loader shard); shard_batch assembles the global array.
local = (
    np.random.default_rng(pid)
    .uniform(-1, 1, (2, cfg.image_size, cfg.image_size, 3))
    .astype(np.float32)
)
x = parallel.shard_batch(mesh, local)
assert x.shape == (4, cfg.image_size, cfg.image_size, 3), x.shape

# The plain (non-R1) step: the same cross-process grad all-reduce with
# half the single-core compile/execute load — this test shares the core
# with the whole suite AND 2x (2 ranks x 2 thread-devices) collectives.
step = trainer.train_step_fn(do_r1=False)
state, metrics = step(state, x, jax.random.PRNGKey(1))
jax.block_until_ready(state)
loss = float(jax.device_get(metrics["Loss_total"]))
assert np.isfinite(loss), loss
print(f"TRAIN_STEP_OK rank={pid} loss_finite=True", flush=True)
"""


def _run_two_ranks(child_src, timeout, extra_env=None):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(rank)
        if extra_env:
            env.update(extra_env)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", child_src],
                cwd=_REPO, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = []
    for rank, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
    return outs


def test_two_process_train_step():
    """The full IDEAS train step ACROSS PROCESSES: 2 ranks x 2 virtual
    devices = a 4-device global data mesh, params replicated globally,
    each rank feeding its local half of the batch; the gradient
    all-reduce crosses the process boundary. This is the executed
    equivalent of the reference actually TRAINING under DDP
    (`/root/reference/stylegan2/train.py:166-245,425-438`), not just
    initializing it."""
    extra_env = {
        "XLA_FLAGS": (
            "--xla_force_host_platform_device_count=2 "
            "--xla_cpu_collective_call_terminate_timeout_seconds=900 "
            "--xla_cpu_collective_timeout_seconds=900"
        )
    }
    # One retry: on this 1-core host the cross-process rendezvous can be
    # starved past its timeout when the whole suite plus a TPU training
    # relay hold the core (observed once in a full-suite run; passes
    # standalone). A genuine regression fails both attempts.
    for attempt in (0, 1):
        try:
            outs = _run_two_ranks(_TRAIN_CHILD, timeout=1500,
                                  extra_env=extra_env)
            break
        except AssertionError:
            if attempt:
                raise
    for rank, out in enumerate(outs):
        assert f"TRAIN_STEP_OK rank={rank} loss_finite=True" in out, out


def test_two_process_psum(tmp_path):
    outs = _run_two_ranks(_CHILD, timeout=600)
    for rank, out in enumerate(outs):
        assert f"PSUM_OK rank={rank} out=3.0" in out, out
