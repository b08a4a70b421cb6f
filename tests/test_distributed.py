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


def test_two_process_psum(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # no virtual device splitting here
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(rank)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _CHILD],
                cwd=_REPO, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = []
    for rank, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
    for rank, out in enumerate(outs):
        assert f"PSUM_OK rank={rank} out=3.0" in out, out
