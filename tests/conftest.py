"""Test config: run all tests on CPU-backend JAX with 8 virtual devices.

Must execute before the first ``import jax`` anywhere in the test session so
the platform/device-count flags take effect (mirrors how the driver validates
multi-chip sharding without real chips).
"""

import os

# The session environment pins JAX_PLATFORMS=axon (the real TPU tunnel) and
# the axon plugin re-asserts it through jax.config at interpreter start, so
# both the env var AND the config flag must be overridden for tests to run
# on the virtual 8-device CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Default run = fast subset (<10 min on the 1-core host). The tests
    marked ``slow`` (long device-synth/train/CLI integration runs) need
    ``RUN_SLOW=1 python -m pytest tests/ -q`` — the documented full suite."""
    if os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow: run with RUN_SLOW=1 for full suite")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
