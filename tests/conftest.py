"""Test harness: run everything on an 8-device virtual CPU mesh.

Multi-device correctness is tested the JAX-native way (SURVEY.md section 4):
`xla_force_host_platform_device_count=8` fakes 8 devices on the host CPU,
so sharding/collective code paths compile and execute without a TPU pod.

jax may already be imported by the interpreter's sitecustomize before this
module runs, so the platform override goes through `jax.config.update`
(effective until the first backend initialization) rather than env vars.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
if "collective_call_terminate_timeout" not in os.environ["XLA_FLAGS"]:
    # On a 1-core host the 8 virtual devices are threads; the default
    # 40 s rendezvous *termination* timeout SIGABRTs the whole process
    # when another process (e.g. a live TPU training run's host loop)
    # competes for the core mid-collective. Same flags as
    # __graft_entry__.dryrun_multichip.
    os.environ["XLA_FLAGS"] += (
        " --xla_cpu_collective_call_terminate_timeout_seconds=900"
        " --xla_cpu_collective_timeout_seconds=900"
    )
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import pytest

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(autouse=True)
def _reset_ambient_mesh():
    """Trainer sets the ambient mesh globally (spatial-sharding hints);
    keep tests isolated from each other's mesh state."""
    yield
    from ideas_tpu import parallel

    parallel.set_ambient_mesh(None)
