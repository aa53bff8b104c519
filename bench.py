"""Benchmark: batched FDDP solves/s on the quadruped-gait problem (TPU).

Mirrors the reference benchmark harness (benchmark/quadrupedal-gaits-
optctrl.cpp:17-100): build the walking OCP at the reference size (T=108
knots: 2x2-knot double support + 4x(25 swing + 1 switch)), warm-start from
the quasi-static trajectory, and time `solve` with maxiter=1 — the MPC
replanning step.  Here the solve is batched over B problem instances
(perturbed initial states) and jitted end-to-end on the TPU.

stdout: ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the driver north star (BASELINE.json): >=1000
batched FDDP solves/s on a 100-step quadruped gait (target set for a
v5p-8 slice; this runs on whatever single chip is attached).

stderr + BENCH_DETAIL.json: auxiliary metrics — per-stage timing split
(the arm-manipulation-timings.cpp analogue), model-FLOPs + MFU estimate
from XLA cost analysis, and a small-batch p50 MPC replan latency.

Env knobs: BENCH_NATIVE=0 (vmapped round 1-4 lane instead of the
batch-native Pallas lane solver), BENCH_B (batch, default 256),
BENCH_MAXITER (default 1),
BENCH_REPS (default 3), BENCH_PROBLEM=quadruped|unicycle,
BENCH_DETAIL=1 to emit the auxiliary metrics (several extra compiles),
BENCH_PR=1 to use the horizon-parallel Riccati backward pass,
BENCH_STAGES=0 to skip the per-stage split, BENCH_SCALING=1 to run the
1/2/4/8-virtual-device scaling points (opt-in: up to 4 subprocesses x
600 s on a cold compile cache; BENCH_SCALING_B sets their batch,
BENCH_SCALING_WORKER is internal).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

# v5e peak: 197 TFLOP/s bf16; f32 on the MXU runs at half rate.  Used only
# for the (approximate) MFU line in BENCH_DETAIL.  Lazy: touching
# jax.devices() at import would pin the backend before the scaling worker
# can force CPU (the axon TPU plugin ignores JAX_PLATFORMS=cpu).
def _peak_flops():
    return {"TPU v5 lite": 98.5e12, "TPU v5": 229.5e12,
            "TPU v4": 137.5e12}.get(
        jax.devices()[0].device_kind if jax.devices() else "", 98.5e12)


def quadruped_problem(dtype=jnp.float32):
    from crocoddyl_tpu.apps.gaits import QuadrupedGaitFactory
    from crocoddyl_tpu.dynamics import robots

    np_dtype = np.float32 if dtype == jnp.float32 else np.float64
    # benchmark robot: ANYmal B from the vendored URDF via the native parser
    # (assets/anymal_b.urdf); BENCH_ROBOT=programmatic falls back to the
    # hand-authored stand-in model.
    if os.environ.get("BENCH_ROBOT", "anymal") == "anymal":
        m = robots.anymal(dtype=np_dtype)
        # reference-instance stance: vendored example-robot-data 'standing'
        # (the q0 of the reference golden logs — see PARITY.md)
        q0 = robots.anymal_standing_q(m, dtype=np_dtype)
    else:
        m = robots.quadruped(dtype=np_dtype)
        q0 = robots.quadruped_standing_q(m, dtype=np_dtype)
    x0 = jnp.concatenate([q0, jnp.zeros(m.nv, dtype)])
    fac = QuadrupedGaitFactory(
        m, ["LF_FOOT", "RF_FOOT", "LH_FOOT", "RH_FOOT"],
        default_q=np.asarray(q0))
    # reference benchmark size: T = 2*2 + 4*(25+1) = 108
    prob = fac.walking_problem(x0, 0.25, 0.15, 1e-2,
                               step_knots=25, support_knots=2)
    return prob, x0


def unicycle_problem(dtype=jnp.float32):
    from crocoddyl_tpu.core.action import replicate_model
    from crocoddyl_tpu.core.problem import ShootingProblem
    from crocoddyl_tpu.models.unicycle import UnicycleModel

    m = UnicycleModel(dt=jnp.asarray(0.1, dtype),
                      cost_weights=jnp.asarray([10.0, 1.0], dtype))
    x0 = jnp.asarray([-1.0, -1.0, 1.0], dtype)
    return ShootingProblem(x0=x0, running=replicate_model(m, 100),
                           terminal=m), x0


def _perturbed_x0s(prob, x0, B, dtype, which):
    key = jax.random.PRNGKey(0)
    noise = 0.01 * jax.random.normal(key, (B, x0.shape[0]), dtype)
    if which == "quadruped":
        nv = prob.state.nv
        noise = noise.at[:, : x0.shape[0] - nv].set(0.0)
    return x0[None] + noise


def _scaling_points():
    """solves/s at 1/2/4/8 mesh devices (subprocess per point: the device
    count is fixed at backend init).  Unicycle problem keeps the CPU lane
    fast; the sharded program is the same `sharded_solve_x0` path a real
    multi-chip mesh runs.

    WEAK scaling: the per-device batch is held constant
    (BENCH_SCALING_B_PER_DEV, default 512) so devices never starve.  On this
    host the virtual devices SHARE the physical cores, so points beyond
    os.cpu_count() measure scheduler oversubscription, not the program —
    the round-4 "regression" 928->787 from 2->8 devices was exactly this
    (2-core host; root-caused round 5: fixed-total 597/541/540/445 vs
    weak 551/943/794/447 — per-device starvation ruled out, contention
    confirmed).  The emitted dict carries host_cores so readers can judge
    which points are physically meaningful."""
    import subprocess
    out = {"mode": "weak_512_per_device", "host_cores": os.cpu_count()}
    per_dev = int(os.environ.get("BENCH_SCALING_B_PER_DEV", "512"))
    for n in (1, 2, 4, 8):
        xla = (os.environ.get("XLA_FLAGS", "")
               + f" --xla_force_host_platform_device_count={n}").strip()
        env = dict(os.environ, JAX_PLATFORMS="cpu", XLA_FLAGS=xla,
                   BENCH_SCALING_WORKER=str(n),
                   BENCH_SCALING_B=str(per_dev * n),
                   # CPU-target cache namespace (see tests/conftest.py)
                   JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache_cpu")
        try:
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env=env, capture_output=True, text=True,
                               timeout=600)
            line = (r.stdout.strip().splitlines()[-1]
                    if r.stdout.strip() else "{}")
            out[str(n)] = json.loads(line).get("solves_per_s")
            if out[str(n)] is None and r.returncode != 0:
                out[f"{n}_error"] = (r.stderr or "")[-300:]
        except subprocess.TimeoutExpired:
            out[f"{n}_error"] = "timeout"
        except (json.JSONDecodeError, OSError) as e:
            out[f"{n}_error"] = str(e)[:300]
    return out


def _scaling_worker(n: int):
    # force the host-CPU backend BEFORE any device use: on this machine the
    # axon TPU plugin ignores JAX_PLATFORMS=cpu (see .claude/skills/verify)
    jax.config.update("jax_platforms", "cpu")
    from crocoddyl_tpu.core.solvers.fddp import SolverSettings, solve
    from crocoddyl_tpu.parallel import mesh as pmesh

    dtype = jnp.float32
    prob, x0 = unicycle_problem(dtype)
    B = int(os.environ.get("BENCH_SCALING_B", "512"))
    settings = SolverSettings(maxiter=20, record_trace=False,
                              parallel_linesearch=False)
    mesh = pmesh.data_mesh(n)
    run = pmesh.sharded_solve_x0(lambda p: solve(p, settings=settings),
                                 prob, mesh)
    key = jax.random.PRNGKey(0)
    x0s = x0[None] + 0.1 * jax.random.normal(key, (B, 3), dtype)
    x0s = pmesh.shard_batch(x0s, mesh)
    run(x0s).cost.block_until_ready()
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        run(x0s).cost.block_until_ready()
    dt_s = (time.perf_counter() - t0) / reps
    print(json.dumps({"devices": n, "solves_per_s": round(B / dt_s, 2)}))


def main():
    if os.environ.get("BENCH_SCALING_WORKER"):
        _scaling_worker(int(os.environ["BENCH_SCALING_WORKER"]))
        return
    from crocoddyl_tpu.core.solvers import fddp
    from crocoddyl_tpu.core.solvers.fddp import SolverSettings, solve

    which = os.environ.get("BENCH_PROBLEM", "quadruped")
    # B=256 default: 1304 solves/s with a ~3.5-min cold compile; B=512
    # peaks at 1437 but costs ~11 min cold (driver-budget risk) —
    # PERF_NOTES r4 batch sweep
    B = int(os.environ.get("BENCH_B", "256"))
    maxiter = int(os.environ.get("BENCH_MAXITER", "1"))
    n_rep = int(os.environ.get("BENCH_REPS", "3"))
    detail = os.environ.get("BENCH_DETAIL", "0") == "1"
    dtype = jnp.float32

    # Build the problem on the host CPU backend: factory construction is
    # eager (FK sweeps, quasi-static setup), and each eager op on the TPU
    # backend pays ~0.4 s of XLA compile — minutes of cold-start for zero
    # benchmark value.  jit moves the arrays to the TPU at the first call.
    with jax.default_device(jax.devices("cpu")[0]):
        if which == "quadruped":
            prob, x0 = quadruped_problem(dtype)
        else:
            prob, x0 = unicycle_problem(dtype)
    T = prob.T

    # Sequential early-exit line search: warm-started MPC steps accept the
    # first step length, so the 10-alpha parallel rollout would be ~10x
    # wasted FLOPs here (ddp.cpp:78-94 semantics).
    settings = SolverSettings(
        maxiter=maxiter, record_trace=False, parallel_linesearch=False,
        parallel_riccati=os.environ.get("BENCH_PR", "0") == "1",
        scan_unroll=int(os.environ.get("BENCH_UNROLL", "1")),
        ms_chunk=int(os.environ.get("BENCH_MS", "0")))

    # Warm start: quasi-static controls from the default stance, the
    # MPC-replan configuration (solver warm-started at the solution
    # neighborhood, maxiter=1 — quadrupedal-gaits-optctrl.cpp:60-72).
    # quasi_static is jitted: eagerly it dispatches hundreds of tiny TPU
    # programs at ~0.4 s XLA-compile each (minutes of cold-start wall).
    xs0 = jnp.tile(prob.x0[None], (T + 1, 1))
    us0 = jax.jit(prob.quasi_static)(xs0)
    x0s = _perturbed_x0s(prob, x0, B, dtype, which)

    # Default lane: the batch-native lane solver (core/solvers/
    # fddp_batch.py — problems on the Pallas lane axis, +~20% measured at
    # B=256; BENCH_NATIVE=0 restores the round 1-4 vmapped lane).
    # Decision-equivalence with vmap(fddp.solve) is pinned in f64 on CPU
    # (tests/test_fddp_batch.py); on TPU f32 the lane kernels' true-f32
    # VPU arithmetic lands on (legitimately) different accepted steps
    # than the vmapped path's reduced-precision MXU matmuls on this
    # chaotic warm start — the lane arithmetic is the MORE accurate of
    # the two (PERF_NOTES round-5 precision note).
    use_native = os.environ.get("BENCH_NATIVE", "1") == "1"
    if use_native:
        from crocoddyl_tpu.core.solvers import fddp_batch
        use_native = fddp_batch.supports(prob, settings)

    def native_fn(x0s):
        return fddp_batch.solve_batch(
            prob, x0s, xs_init=xs0, us_init=us0,
            settings=settings).cost

    def vmapped_fn(x0s):
        def one(x0_i):
            s = solve(prob.replace(x0=x0_i), xs_init=xs0, us_init=us0,
                      settings=settings)
            return s.cost
        return jax.vmap(one)(x0s)

    run_fn = native_fn if use_native else vmapped_fn

    def compile_or_fallback(run_fn):
        # safety net ladder: if a kernel lane fails to compile/run on THIS
        # chip (driver hardware may differ from the dev chip), fall back
        # batch-native -> vmapped -> generic-XLA rather than losing the
        # benchmark entirely
        run = jax.jit(run_fn)
        try:
            return run_fn, run, run(x0s).block_until_ready()
        except Exception as e:
            print(json.dumps({"bench_fallback": str(e)[:200]}),
                  file=sys.stderr)
            from crocoddyl_tpu.ops import fused_node as _fn
            if run_fn is native_fn:
                return compile_or_fallback(vmapped_fn)
            if _fn.fused_mode() == "off":
                raise
            _fn.set_fused_mode("off")
            run = jax.jit(vmapped_fn)
            return vmapped_fn, run, run(x0s).block_until_ready()

    run_fn, run, costs = compile_or_fallback(run_fn)
    assert not bool(jnp.isnan(costs).any()), "NaN cost in benchmark solve"

    # block_until_ready per rep: the call has ONE device-resident operand,
    # so per-call dispatch is ~0.06 ms on this tunnel (measured; the
    # methodology of every previous round, kept for comparability).  A
    # full np.asarray fetch costs a flat ~25 ms here and would bias the
    # step time (round-5 tunnel calibration, PERF_NOTES).
    t0 = time.perf_counter()
    for _ in range(n_rep):
        run(x0s).block_until_ready()
    dt_s = (time.perf_counter() - t0) / n_rep
    solves_per_s = B / dt_s

    aux = {"batch": B, "T": T, "maxiter": maxiter,
           "backend": jax.default_backend(),
           "device": jax.devices()[0].device_kind,
           "solves_per_s": round(solves_per_s, 2),
           "step_ms": round(dt_s * 1e3, 2)}

    if detail:
        # ---- MFU from XLA's model-FLOPs estimate --------------------------
        try:
            compiled = jax.jit(run_fn).lower(x0s).compile()
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops = float(ca.get("flops", 0.0))
            aux["model_tflops_per_step"] = round(flops / 1e12, 4)
            aux["model_flops_per_s"] = round(flops / dt_s / 1e12, 3)
            aux["mfu_pct"] = round(100.0 * flops / dt_s / _peak_flops(), 3)
            mem = compiled.memory_analysis()
            if mem is not None:
                aux["hbm_temp_gb"] = round(
                    getattr(mem, "temp_size_in_bytes", 0) / 2**30, 2)
        except Exception as e:  # pragma: no cover
            aux["cost_analysis_error"] = str(e)

        # ---- small-batch MPC replan latency -------------------------------
        # DEVICE time via an in-jit amortized loop (K solves chained by a
        # data dependency, one host sync): on this tunneled runtime a
        # Python-level call with many operands costs 25-40 ms of dispatch,
        # which would swamp the kernel-level latency being measured
        # (round-5 calibration).  Lanes: sequential baseline; fused_scans
        # (whole-scan Pallas kernels, ops/fused_scans.py); and the r4
        # levers PR (parallel Riccati) / MS+PR for comparison.
        def latency_amortized(tag, xs_w=None, us_w=None, **st_kw):
            st_lat = SolverSettings(
                maxiter=maxiter, record_trace=False,
                parallel_linesearch=False, **st_kw)
            xs_w = xs0 if xs_w is None else xs_w
            us_w = us0 if us_w is None else us_w
            K_REP = 10

            def loop(eps):
                def body(i, carry):
                    e, acc = carry
                    x0_i = prob.x0.at[-1].add(e * 1e-6)
                    s = solve(prob.replace(x0=x0_i), xs_init=xs_w,
                              us_init=us_w, settings=st_lat)
                    return (s.cost * 1e-30 + eps, acc + s.cost)
                return jax.lax.fori_loop(
                    0, K_REP, body, (eps, jnp.zeros((), dtype)))[1]

            f = jax.jit(loop)
            float(f(jnp.asarray(0.0, dtype)))   # compile + warm
            t0 = time.perf_counter()
            float(f(jnp.asarray(1e-30, dtype)))
            wall_ms = (time.perf_counter() - t0) * 1e3
            return round((wall_ms - 24.6) / K_REP, 2)  # subtract fetch RTT

        for tag, kw_l in (("", {}), ("fscan_", {"fused_scans": True}),
                          ("pr_", {"parallel_riccati": True})):
            try:
                aux[f"replan_latency_b1_{tag}device_ms"] = \
                    latency_amortized(tag, **kw_l)
            except Exception as e:  # pragma: no cover
                aux[f"latency_{tag}error"] = str(e)[:300]

        # steady-state MPC replan: warm-started at the CONVERGED solution
        # (the real ~1 kHz MPC operating point — circularAppend reuses the
        # previous solution, shooting.hpp:112-129).  The quasi-static lanes
        # above are a cold-replan stress case: their line search rejects
        # several alphas, each a full trial rollout (benchmarks/
        # profile_b1.py bisect: one inlined iteration is 2.7 ms while the
        # quasi-static-warm-started solve is ~11.5 ms).
        try:
            st_conv = SolverSettings(maxiter=50, record_trace=False,
                                     parallel_linesearch=False,
                                     fused_scans=True)
            sol_w = jax.jit(lambda: solve(prob, xs_init=xs0, us_init=us0,
                                          settings=st_conv))()
            sol_w.cost.block_until_ready()
            aux["replan_latency_b1_fscan_warm_device_ms"] = \
                latency_amortized("warm", xs_w=sol_w.xs, us_w=sol_w.us,
                                  fused_scans=True)
        except Exception as e:  # pragma: no cover
            aux["latency_warm_error"] = str(e)[:300]

        # ---- per-stage split (calc_diff / backward / forward) -------------
        def stage_times():
            xs_b = jnp.tile(xs0[None], (B, 1, 1))
            us_b = jnp.tile(us0[None], (B, 1, 1))
            cd = jax.jit(jax.vmap(lambda xs, us: jax.tree_util.tree_leaves(
                fddp._calc_diff(prob, xs, us, jnp.zeros((), bool)))[0].sum()))
            d1, dt1, f1, _ = jax.jit(jax.vmap(
                lambda xs, us: fddp._calc_diff(prob, xs, us,
                                               jnp.zeros((), bool))))(
                xs_b, us_b)
            bw = jax.jit(jax.vmap(lambda d, dtm, f: fddp._backward_pass(
                d, dtm, f, jnp.asarray(1e-9, dtype),
                jnp.asarray(1e-9, dtype))[4].sum()))
            k0 = jnp.zeros((B, T, prob.nu), dtype)
            K0 = jnp.zeros((B, T, prob.nu, prob.state.ndx), dtype)
            fw = jax.jit(jax.vmap(lambda xs, us, k, K, f: fddp._forward_pass(
                prob, xs, us, k, K, f, jnp.asarray(1.0, dtype))[2]))
            out = {}
            # device time via amortized in-jit loops (see latency note);
            # the carry perturbs the first argument so the loop body is NOT
            # loop-invariant (XLA would hoist a pure repeated call)
            def amort(fn, *args):
                def loop(eps):
                    def body(i, e):
                        a0 = jax.tree.map(lambda l: l + e * 1e-30, args[0])
                        return fn(a0, *args[1:]).sum() * 1e-30 + e
                    return jax.lax.fori_loop(0, 5, body, eps)
                g = jax.jit(loop)
                float(g(jnp.asarray(0.0, dtype)))
                t0 = time.perf_counter()
                float(g(jnp.asarray(1e-30, dtype)))
                return round(((time.perf_counter() - t0) * 1e3 - 24.6) / 5,
                             2)

            for name, fn, args in (
                    ("calc_diff_ms", cd, (xs_b, us_b)),
                    ("backward_ms", bw, (d1, dt1, f1)),
                    ("forward_ms", fw, (xs_b, us_b, k0, K0, f1))):
                try:
                    out[name] = amort(lambda *a, _f=fn: _f(*a), *args)
                    out["stage_timing_method"] = "amortized_device"
                except Exception:
                    # the amortized wrapper can exceed the remote compile
                    # server's request-size limit for the largest stage
                    # programs; fall back to per-call block timing (carries
                    # ~25-40 ms host dispatch on this tunnel — see
                    # PERF_NOTES r5 calibration)
                    fn(*args).block_until_ready()
                    t0 = time.perf_counter()
                    for _ in range(3):
                        fn(*args).block_until_ready()
                    out[name] = round((time.perf_counter() - t0) / 3 * 1e3,
                                      2)
                    out["stage_timing_method"] = "per_call_block"
            return out

        if os.environ.get("BENCH_STAGES", "1") != "0":
            try:
                aux.update(stage_times())
            except Exception as e:  # pragma: no cover
                aux["stage_error"] = str(e)

        # ---- virtual-device scaling points (BASELINE.md §3) ---------------
        # Batched solves sharded over a 1/2/4/8-device mesh.  On this single-
        # chip host the mesh is XLA's virtual CPU devices, so the numbers
        # validate the sharded program (same code path as a real pod slice),
        # not hardware scaling — they share the host's cores.
        if os.environ.get("BENCH_SCALING", "0") == "1":
            try:
                aux["scaling_virtual_cpu"] = _scaling_points()
            except Exception as e:  # pragma: no cover
                aux["scaling_error"] = str(e)

        print(json.dumps(aux), file=sys.stderr)
        try:
            path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "BENCH_DETAIL.json")
            merged = {}
            if os.path.exists(path):  # merge: partial lanes accumulate
                try:
                    with open(path) as f:
                        merged = json.load(f)
                except (OSError, json.JSONDecodeError):
                    merged = {}
            merged.update(aux)
            with open(path, "w") as f:
                json.dump(merged, f, indent=1)
        except OSError:
            pass

    line = {
        "metric": f"batched_fddp_{which}_T{T}_maxiter{maxiter}_solves_per_s",
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 1000.0, 4),
    }
    # surface the most recent scaling-lane points (BENCH_DETAIL.json) in the
    # driver-visible line; "cached" = measured by the last BENCH_SCALING=1
    # run, not re-measured here (the 4-subprocess lane would blow the
    # driver's bench budget)
    try:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_DETAIL.json")
        with open(path) as fjson:
            sc = json.load(fjson).get("scaling_virtual_cpu")
        if sc:
            line["scaling_virtual_cpu_cached"] = sc
    except (OSError, json.JSONDecodeError):
        pass
    print(json.dumps(line))


if __name__ == "__main__":
    main()
