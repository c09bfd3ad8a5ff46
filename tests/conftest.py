"""Test configuration: run the suite on the XLA CPU backend with a virtual
8-device mesh so sharding paths execute in CI exactly like the reference's
CPU paths do (SURVEY.md §4: GPU tests in the reference simply skip — we
instead fake the device layer).

The environment may pin JAX_PLATFORMS to a TPU plugin; the plugin wins over
env overrides, so the platform is forced via jax.config before any backend
initialises.
"""

import os

import jax

if os.environ.get("FS_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
