"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; tests validate sharding and
collectives on 8 forced CPU host devices (SURVEY.md §4.5). Benchmarks
(bench.py) run on the real TPU chip instead.

IMPORTANT environment quirk: this machine's sitecustomize registers the
'axon' TPU-tunnel backend and programmatically sets jax_platforms to
"axon,cpu" — OVERRIDING the JAX_PLATFORMS env var. The only reliable way
to keep unit tests off the (slow, shared, single-chip) tunnel is
jax.config.update("jax_platforms", "cpu") after import, plus XLA_FLAGS
before backend initialization for the 8 virtual devices.
"""

import os

# Must be set before the first backend initialization.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache: model graphs (res26 = 24 convs) take tens of
# seconds to compile; identical graphs hit this cache on reruns.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def pytest_configure(config):
    assert jax.default_backend() == "cpu", "unit tests must not run on the TPU tunnel"
    assert jax.device_count() == 8, "expected 8 virtual CPU devices"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
