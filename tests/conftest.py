"""Test env: force an 8-device virtual CPU platform so sharding tests run anywhere.

The container's sitecustomize pre-imports jax and registers the axon TPU
backend in every interpreter, so JAX_PLATFORMS in the environment is not
enough — switch platforms via jax.config after import. XLA_FLAGS still works
because the CPU client initializes lazily on first use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("DSLTPU_HW") != "1":
    # Default: virtual 8-device CPU mesh, runs anywhere. DSLTPU_HW=1 keeps
    # the real TPU backend for the hardware-gated tests
    # (tests/test_tpu_hardware.py); everything else should be run separately.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running stress/soak tests (still in the "
        "default run; deselect with -m 'not slow')")
