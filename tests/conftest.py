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
