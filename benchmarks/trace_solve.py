"""Capture a jax.profiler trace of the benchmark solve and print per-op
attribution (the xprof/op-profile analogue, parsed from the chrome trace).

Usage: python -m benchmarks.trace_solve [--top 40] [--reps 3]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import time
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp


def capture(run, args, tracedir):
    run(*args).block_until_ready()  # warmup/compile
    with jax.profiler.trace(tracedir):
        for _ in range(3):
            run(*args).block_until_ready()


def parse(tracedir, top=40, reps=3):
    paths = glob.glob(os.path.join(tracedir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no trace found under {tracedir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    # identify device-side process ids (TPU ops run on pids whose names
    # mention the device); host python threads are excluded
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name" and "args" in e}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device:" in n or "Device" in n}
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        tot[name] += e.get("dur", 0.0)
        cnt[name] += 1
    rows = sorted(tot.items(), key=lambda kv: -kv[1])
    total = sum(tot.values())
    print(f"pids seen: {pid_names}")
    print(f"\ndevice op time total: {total/1e3/reps:.2f} ms/step "
          f"({len(rows)} distinct ops)")
    print(f"{'ms/step':>9}  {'%':>5}  {'count':>6}  op")
    for name, us in rows[:top]:
        print(f"{us/1e3/reps:9.3f}  {100*us/total:5.1f}  "
              f"{cnt[name]//reps:6d}  {name[:110]}")
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--tracedir", default="/tmp/jtrace")
    args = ap.parse_args()

    from bench import quadruped_problem, _perturbed_x0s
    from crocoddyl_tpu.core.solvers.fddp import SolverSettings, solve

    dtype = jnp.float32
    prob, x0 = quadruped_problem(dtype)
    T = prob.T
    B = args.batch
    settings = SolverSettings(maxiter=1, record_trace=False,
                              parallel_linesearch=False)
    xs0 = jnp.tile(prob.x0[None], (T + 1, 1))
    us0 = prob.quasi_static(xs0)
    x0s = _perturbed_x0s(prob, x0, B, dtype, "quadruped")

    def run_fn(x0s):
        def one(x0_i):
            s = solve(prob.replace(x0=x0_i), xs_init=xs0, us_init=us0,
                      settings=settings)
            return s.cost
        return jax.vmap(one)(x0s)

    run = jax.jit(run_fn)
    os.makedirs(args.tracedir, exist_ok=True)
    capture(run, (x0s,), args.tracedir)
    parse(args.tracedir, args.top, args.reps)


if __name__ == "__main__":
    main()
