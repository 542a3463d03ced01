"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI, so sharding tests use XLA's
host-platform device-count override. x64 is enabled so kernel parity tests can
compare against sklearn in float64.
"""

import os

# Force CPU: the environment presets an experimental TPU plugin platform via
# sitecustomize; tests need the CPU backend (virtual 8-device mesh + float64).
# The env var alone is not enough once the plugin is registered — the jax
# config knob is authoritative.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compile cache (repo-local, gitignored, shared with bench.py):
# the suite compiles ~100 distinct CPU programs; on a fresh machine that
# dominates the first run's wall time (measured >580 s cold vs ~83 s warm on
# this 1-vCPU host class). Entries are keyed by backend+config, so CPU test
# entries and the bench's TPU entries coexist in one directory.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
