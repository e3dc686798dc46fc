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
# across test runs. The dir is KEYED TO THE DEVICE CONFIG: entries compiled
# for a different xla_force_host_platform_device_count collide (the cache key
# misses the replica count -> "Execution supplied N buffers but compiled
# program expected M" at run time), so the 8-virtual-device suite must not
# share a cache with single-device scripts.
jax.config.update("jax_compilation_cache_dir", "/tmp/wurblpt_jax_cache_cpu8")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# jax 0.9.0 dispatch-fastpath fault isolated in round 3: after program A runs,
# a second distinct program B over a similar arg pytree fails on its SECOND
# execution with "Execution supplied N buffers but compiled program expected
# N+2" — the global shared C++ PjitFunctionCache mis-associates fastpath data
# (including hoisted const_args) across programs. Forcing every dispatch down
# the Python path (fastpath data = None) sidesteps it; dispatch overhead is
# ~100 us/call, noise next to our >10 ms programs. The TPU twin of this fault
# is why bench.py isolates configs in subprocesses.
#
# GATED ON THE EXACT JAX VERSION the bug was isolated on (advisor round-3
# finding): on any other jax, fail loudly instead of silently (a) patching a
# private symbol that may have moved, or (b) masking an upstream fix — the
# person upgrading jax should re-test the fastpath (tools/repro_fastpath.py
# reproduces the fault standalone) and either extend the gate or delete the
# patch.
if jax.__version__ == "0.9.0":
    import jax._src.pjit as _pjit  # noqa: E402

    _pjit._get_fastpath_data = lambda *a, **k: None
else:
    # Do NOT hard-fail collection on other jax versions (advisor round-4:
    # a RuntimeError here made the whole suite unrunnable everywhere else,
    # including versions where the bug may be fixed). The patch is simply
    # not applied, and tests/test_fastpath_guard.py runs the standalone
    # reproducer: if the PjitFunctionCache fault still exists unpatched on
    # the new version, THAT test fails with a pointer here.
    import warnings

    warnings.warn(
        f"jax {jax.__version__} != 0.9.0: dispatch-fastpath workaround NOT "
        "applied (isolated on 0.9.0); test_fastpath_guard probes whether "
        "the fault reproduces on this version.")
