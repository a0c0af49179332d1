"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding logic (shard_map fan-out, per-shard top-k merge over
the mesh) is validated on host CPU exactly as the driver's
dryrun_multichip does; the real-TPU path is exercised by bench.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override any ambient TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's sitecustomize registers a TPU PJRT plugin and pins
# JAX_PLATFORMS at import time; jax.config wins over both.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# vendored eval data (data/README.md for provenance)
VENDORED_VALIDATION = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "validation_set.csv",
)


@pytest.fixture(scope="session")
def validation_csv():
    if not os.path.exists(VENDORED_VALIDATION):
        pytest.skip("vendored validation_set.csv not available")
    return VENDORED_VALIDATION


@pytest.fixture
def rng():
    return np.random.default_rng(0)
