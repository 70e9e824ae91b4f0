"""Test harness configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding
path (`walnuts_tpu.parallel`) is exercised without TPU hardware, per
the driver contract.  Env vars must be set before jax imports.
"""

import os

# Disable the axon TPU PJRT plugin registration and force a virtual
# 8-device CPU platform for mesh tests.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon already in the environment, so the env vars above
# arrive too late for backend selection — override via config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the full suite compiles ~400 XLA CPU
# programs in one process, and this jaxlib's CPU backend intermittently
# segfaults inside backend_compile_and_load after ~100 tests (observed
# at different tests on different runs; every file passes standalone).
# With the cache, reruns load executables from disk instead of
# recompiling, which removes almost the entire crash window.  If a
# cold-cache run does crash, simply rerun — completed compiles are
# already cached.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
