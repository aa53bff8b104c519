#!/usr/bin/env bash
# Process-isolated fast-lane suite runner.
#
# XLA:CPU on this class of host segfaults nondeterministically in very long
# single-process pytest runs (observed inside backend_compile_and_load and
# executable (de)serialization, at varying items; every file passes in its
# own process).  ROOT CAUSE (round 5): the persistent compile cache was
# shared with the axon TPU terminal, whose remote compiler emits XLA:CPU
# AOT executables for a DIFFERENT machine-feature set; the cache key does
# not include the target, and cpu_aot_loader explicitly warns the
# mismatched entries "could lead to execution errors such as SIGILL".
# tests/conftest.py now uses a CPU-only cache dir (/tmp/jax_cache_cpu);
# the per-file isolation is kept as defense in depth.  Usage:
#     bash tests/run_suite.sh [extra pytest args]
set -u
cd "$(dirname "$0")/.."
fail=0
for f in tests/test_*.py; do
  echo "=== $f"
  if ! python -m pytest "$f" -q -m "not slow" -p no:cacheprovider "$@"; then
    echo "FAILED: $f"
    fail=1
  fi
done
exit $fail
