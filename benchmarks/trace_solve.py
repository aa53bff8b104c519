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
import re
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


def _category(name):
    """Collapse HLO op names into readable buckets."""
    base = name.split("(")[0]
    for pre in ("while", "fusion", "copy", "dynamic-update-slice",
                "dynamic_update_slice", "dynamic-slice", "concatenate",
                "convolution", "dot", "transpose", "bitcast", "reduce",
                "broadcast", "select", "pad", "slice", "add", "multiply",
                "subtract", "rsqrt", "compare", "iota", "scatter",
                "gather", "custom-call", "all-reduce", "log", "exp",
                "constant", "tuple", "get-tuple-element", "jit_"):
        if base.startswith(pre):
            return pre
    if "_fusion" in base or "fusion" in base:
        return "fusion(named)"
    return re.sub(r"[.\d]+$", "", base) or base


def parse(tracedir, top=40, reps=3):
    paths = glob.glob(os.path.join(tracedir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no trace found under {tracedir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name" and "args" in e}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device:" in n or "Device" in n}

    # group complete events per (pid, tid); compute SELF time by interval
    # nesting (chrome trace events on one tid are properly nested)
    by_tid = defaultdict(list)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        by_tid[(e["pid"], e.get("tid", 0))].append(
            (e["ts"], e["ts"] + e.get("dur", 0.0), e.get("name", "?")))

    self_tot = defaultdict(float)
    span_tot = defaultdict(float)
    cnt = defaultdict(int)
    busy_leaf = 0.0
    for evs in by_tid.values():
        evs.sort(key=lambda t: (t[0], -t[1]))
        stack = []  # (start, end, name, child_time)
        def pop(ev_end=None):
            nonlocal busy_leaf
            while stack and (ev_end is None or stack[-1][1] <= ev_end):
                s, t, n, child = stack.pop()
                self_us = (t - s) - child
                self_tot[n] += self_us
                span_tot[n] += (t - s)
                cnt[n] += 1
                if child == 0.0:
                    busy_leaf += (t - s)
                if stack:
                    stack[-1][3] += (t - s)
        for ts, te, name in evs:
            while stack and stack[-1][1] <= ts:
                pop(ts)
            stack.append([ts, te, name, 0.0])
        pop()

    rows = sorted(self_tot.items(), key=lambda kv: -kv[1])
    total_self = sum(self_tot.values())
    print(f"pids seen: {pid_names}")
    print(f"\ndevice leaf-busy total: {busy_leaf/1e3/reps:.2f} ms/step")
    print(f"\n-- top ops by SELF time ({len(rows)} distinct) --")
    print(f"{'self ms':>9} {'span ms':>9}  {'%':>5} {'count':>6}  op")
    for name, us in rows[:top]:
        print(f"{us/1e3/reps:9.3f} {span_tot[name]/1e3/reps:9.3f}  "
              f"{100*us/total_self:5.1f} {cnt[name]//reps:6d}  {name[:100]}")

    # category rollup
    cats = defaultdict(float)
    for name, us in self_tot.items():
        cats[_category(name)] += us
    print("\n-- category rollup (self time) --")
    for c, us in sorted(cats.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{us/1e3/reps:9.3f} ms/step  {100*us/total_self:5.1f}%  {c}")
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--tracedir", default="/tmp/jtrace")
    ap.add_argument("--stage", default="solve",
                    choices=["solve", "calc_diff", "backward", "forward"])
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

    from crocoddyl_tpu.core.solvers import fddp

    if args.stage == "solve":
        def run_fn(x0s):
            def one(x0_i):
                s = solve(prob.replace(x0=x0_i), xs_init=xs0, us_init=us0,
                          settings=settings)
                return s.cost
            return jax.vmap(one)(x0s)
        run = jax.jit(run_fn)
        run_args = (x0s,)
    else:
        xs_b = jnp.tile(xs0[None], (B, 1, 1))
        us_b = jnp.tile(us0[None], (B, 1, 1))
        if args.stage == "calc_diff":
            run = jax.jit(jax.vmap(
                lambda xs, us: jax.tree_util.tree_leaves(
                    fddp._calc_diff(prob, xs, us, jnp.zeros((), bool)))[0]
                .sum()))
            run_args = (xs_b, us_b)
        elif args.stage == "backward":
            d1, dt1, f1, _ = jax.jit(jax.vmap(
                lambda xs, us: fddp._calc_diff(prob, xs, us,
                                               jnp.zeros((), bool))))(
                xs_b, us_b)
            run = jax.jit(jax.vmap(lambda d, dtm, f: fddp._backward_pass(
                d, dtm, f, jnp.asarray(1e-9, jnp.float32),
                jnp.asarray(1e-9, jnp.float32))[4].sum()))
            run_args = (d1, dt1, f1)
        else:
            _, _, f1, _ = jax.jit(jax.vmap(
                lambda xs, us: fddp._calc_diff(prob, xs, us,
                                               jnp.zeros((), bool))))(
                xs_b, us_b)
            k0 = jnp.zeros((B, T, prob.nu), jnp.float32)
            K0 = jnp.zeros((B, T, prob.nu, prob.state.ndx), jnp.float32)
            run = jax.jit(jax.vmap(
                lambda xs, us, k, K, f: fddp._forward_pass(
                    prob, xs, us, k, K, f, jnp.asarray(1.0, jnp.float32))[2]))
            run_args = (xs_b, us_b, k0, K0, f1)

    os.makedirs(args.tracedir, exist_ok=True)
    capture(run, run_args, args.tracedir)
    parse(args.tracedir, args.top, args.reps)


if __name__ == "__main__":
    main()
