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
# SEPARATE cache namespace for CPU-oracle tests: the axon TPU terminal
# remote-compiles XLA:CPU executables with its OWN machine features and the
# persistent-cache key does not distinguish the target, so a shared dir
# serves AOT entries the host cannot safely execute (cpu_aot_loader warns
# "Machine type ... doesn't match ... could lead to execution errors such
# as SIGILL") — the prime suspect for the nondeterministic long-run
# segfaults that forced tests/run_suite.sh's process-per-file isolation.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_collection_modifyitems(config, items):
    """Run the gait suites first: their first-ever compile writes multi-MB
    executables to the persistent cache, and XLA's executable.serialize()
    has been observed to segfault when that first write happens late in a
    long test process (deterministic at the same item; fine in a fresh
    process).  Fronting them makes the cold-cache write happen with a
    fresh heap; warm-cache runs are unaffected."""
    front = [it for it in items if "test_gaits" in it.nodeid]
    rest = [it for it in items if "test_gaits" not in it.nodeid]
    items[:] = front + rest
