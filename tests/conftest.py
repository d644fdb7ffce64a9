"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is tested the standard TPU-less way: force the host
platform and split it into 8 XLA devices so `jax.sharding.Mesh` / jit / shard_map
paths compile and execute exactly as they would across chips.
"""

import os

# PEPPA_TEST_TPU=1 opts into the real chip for the hardware-gated tests
# (tests/test_pallas_onchip.py); everything else is written for the virtual
# CPU mesh and should run with the default forcing below.
_USE_TPU = os.environ.get("PEPPA_TEST_TPU") == "1"
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"  # the session env may point at a TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA CPU hard-aborts the whole process ("Exiting to ensure a consistent
# program state") when a collective's participant threads take more than 40 s
# to rendezvous.  On a 1-core host running 8 virtual devices that's a
# scheduling-starvation flake, not a deadlock — observed as a spurious
# SIGABRT ~70 min into the full suite (XLA logs "Thread is unstuck! Warning
# above was a false-positive" when it narrowly misses).  Raise the warn /
# terminate timeouts so starvation can't kill the run; real deadlocks still
# terminate, just later.
if "collective_call_terminate" not in flags:
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags

# A TPU plugin loaded from sitecustomize may have already imported jax and
# called jax.config.update("jax_platforms", ...), which takes precedence over
# the env var — override it back at the config level.
import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
