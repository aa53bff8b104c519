"""Test configuration: CPU backend, float64, 8 virtual devices for mesh tests.

Mirrors the reference's test strategy of exact numerical oracles (SURVEY §4):
we run tests in float64 on CPU; TPU execution uses float32 via the same
dtype-polymorphic code paths.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # tests are float64 CPU-oracle tests
os.environ.setdefault("JAX_ENABLE_X64", "true")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env setup)

# A pytest plugin may import jax before this conftest runs; config.update
# still wins as long as no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
