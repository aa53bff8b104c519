#!/usr/bin/env bash
# Process-isolated fast-lane suite runner.
#
# XLA:CPU on this class of host segfaults nondeterministically in very long
# single-process pytest runs (observed inside backend_compile_and_load and
# executable (de)serialization, at varying items; every file passes in its
# own process).  Running one pytest process per test file sidesteps the
# instability and matches how CI shards anyway.  Usage:
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
