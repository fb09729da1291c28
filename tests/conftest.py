"""Test config: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is only used by bench.py; tests are deterministic on CPU
and exercise the multi-chip sharding path via
``--xla_force_host_platform_device_count=8``.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep matmuls deterministic & precise on CPU for golden tests.
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The image's sitecustomize force-registers the tunneled TPU ("axon")
# platform and prepends it to jax_platforms, overriding the env var — pin
# the config back to CPU before any backend is touched.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
