"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is tested the standard TPU-less way: force the host
platform and split it into 8 XLA devices so `jax.sharding.Mesh` / jit / shard_map
paths compile and execute exactly as they would across chips.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env may point at a TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# A TPU plugin loaded from sitecustomize may have already imported jax and
# called jax.config.update("jax_platforms", ...), which takes precedence over
# the env var — override it back at the config level.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
