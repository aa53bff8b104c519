"""Record golden convergence values + trace logs for every example config.

Usage:  python tests/record_golden.py [name ...]

Writes tests/golden.json ({name: {iters, cost, converged}}) and a
CallbackVerbose-format trace to examples/log/<name>.log — the analogue of
the reference's checked-in golden logs (examples/log/*.log,
examples/CMakeLists.txt:20-26).
"""

import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# CPU-target cache namespace, shared with tests/conftest.py (keeping the
# TPU terminal's remote-compiler entries out — see tests/run_suite.sh)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from golden_configs import EXAMPLES  # noqa: E402
GOLDEN = os.path.join(ROOT, "tests", "golden.json")
LOGDIR = os.path.join(ROOT, "examples", "log")


def main(names):
    from crocoddyl_tpu.utils.callbacks import format_trace

    os.makedirs(LOGDIR, exist_ok=True)
    golden = {}
    if os.path.exists(GOLDEN):
        with open(GOLDEN) as f:
            golden = json.load(f)
    for name in names:
        print(f"[record] {name} ...", flush=True)
        sol = EXAMPLES[name]()
        rec = {"iters": int(sol.iter), "cost": float(sol.cost),
               "converged": bool(sol.converged)}
        golden[name] = rec
        print(f"[record] {name}: {rec}", flush=True)
        if sol.trace is not None:
            with open(os.path.join(LOGDIR, f"{name}.log"), "w") as f:
                f.write(format_trace(sol.trace, sol.iter) + "\n")
        with open(GOLDEN, "w") as f:
            json.dump(golden, f, indent=1, sort_keys=True)
    print(f"wrote {GOLDEN}")


if __name__ == "__main__":
    main(sys.argv[1:] or list(EXAMPLES))
