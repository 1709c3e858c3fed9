"""Test env: force an 8-device virtual CPU platform so sharding tests run anywhere.

The container's sitecustomize pre-imports jax and registers the axon TPU
backend in every interpreter, so JAX_PLATFORMS in the environment is not
enough — switch platforms via jax.config after import. XLA_FLAGS still works
because the CPU client initializes lazily on first use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # Interpret-mode Pallas work serializes across the 8 virtual devices;
    # with the default 40 s rendezvous termination timeout, scheduling
    # jitter can put >40 s between the first and last program reaching a
    # collective and ABORT the whole pytest process (seen flaking on the
    # dense-halo PCISPH tests at ~their measured runtime). Raise it — slow
    # is fine, aborted is not.
    flags = (flags
             + " --xla_cpu_collective_call_terminate_timeout_seconds=600")
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

try:
    # Persistent compile cache (shared with bench.py / __graft_entry__):
    # repeated suite runs replay their XLA compiles from disk.
    _cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass

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
