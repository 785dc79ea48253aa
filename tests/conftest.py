"""Test config: force CPU with 8 fake devices so mesh/sharding tests run
anywhere (SURVEY.md §4: the reference has no such tests; we add them).

Note: on this machine the axon TPU plugin ignores the JAX_PLATFORMS env var,
so we must use jax.config.update *before* any backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
