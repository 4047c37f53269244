"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; tests validate sharding and
collectives on `--xla_force_host_platform_device_count=8` CPU devices
(SURVEY.md §4.5). Benchmarks (bench.py) run on the real TPU chip instead.
"""

import os

# Must be set before jax import anywhere in the test process. Forced (not
# setdefault): the session environment pins JAX_PLATFORMS=axon (the TPU
# tunnel), which would route every unit test through the single real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
