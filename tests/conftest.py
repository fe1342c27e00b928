"""Test configuration: force a local 8-device CPU mesh.

The hosting environment's sitecustomize registers a TPU backend that wins
over JAX_PLATFORMS from the environment, so the platform must be forced via
jax.config BEFORE any jax operation runs.  Tests run on CPU so they are
deterministic, parallel-safe (the single TPU chip is exclusive), and can
fake an 8-chip mesh for sharding tests.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # f64 golden math on CPU

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def golden_dir():
    return os.path.join(os.path.dirname(__file__), "goldens")


def load_golden(name):
    from PIL import Image

    path = os.path.join(os.path.dirname(__file__), "goldens", name)
    return np.asarray(Image.open(path).convert("RGB")).astype(np.float64) / 255.0
