"""Test configuration: force CPU with 8 virtual devices BEFORE importing jax.

Multi-chip sharding tests run on a virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8), per SURVEY.md section 4's
"multi-host tests runnable on CPU" requirement. Real-TPU execution is covered
by bench.py, which the driver runs on hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone is NOT honored in this environment (the axon TPU plugin
# wins platform selection regardless); the config update is authoritative.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compile cache: the wavefront loop is expensive to compile; cache
# across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/wurblpt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
