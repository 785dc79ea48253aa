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

if os.environ.get("FGT_TEST_TPU") == "1":
    # Hardware tier (tests/test_tpu_hardware.py): leave the real backend in
    # place so -m tpu tests compile on the chip. Run ONLY with -m tpu in
    # this mode — every other test assumes the 8-device CPU mesh that this
    # branch skips (scripts/run_tests.py --tier tpu does it right).
    pass
else:
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
