"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding logic is validated on virtual CPU devices
(``xla_force_host_platform_device_count``), mirroring how the driver
dry-run-compiles the multi-chip path. Must run before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# A site hook may force JAX_PLATFORMS to the TPU plugin after our env var;
# override at the config level so tests always run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

# CPU XLA defaults to fast low-precision matmuls; parity tests need exact f32.
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def rng():
    return np.random.RandomState(0)
