"""Benchmark entry point (driver-run, real TPU).

Prints JSON lines {"metric", "value", "unit", "vs_baseline"}; the FINAL
line is the flagship number. A provisional line is printed as soon as the
first timed repetition completes so a partially-run bench still parses
(round-1 lesson: rc=124 with no output).

Flagship metric (BASELINE.json north star): scenario-batched whole-body MPC
updates/s on the ANYmal trot problem — contact dynamics + friction-cone
PDIPM + impact slots, T=0.5, N=20, max_iter=2 Newton updates per MPC step,
f32 — the reference's MPC cadence (reference examples/a1/mpc/trot.py:
max_iter=2 at 400 Hz => 2.5 ms/update budget on a desktop CPU).
vs_baseline = aggregate batched MPC updates/s / 400 (the single-core
reference cadence).
"""
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

# Persistent compilation cache: TPU first-compiles go through a slow
# remote-compile path in this environment; cache them across runs.
os.makedirs(os.path.expanduser("~/.cache/robotoc_tpu_xla"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/robotoc_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
# f32 Riccati/condensing needs true f32 matmuls: the MXU's default bf16
# passes lose too much precision for the ill-conditioned cost Hessians
# (q_weight 2.5e5 vs a_weight 1e-6).
jax.config.update("jax_default_matmul_precision",
                  os.environ.get("BENCH_PREC", "highest"))


def emit(value_updates_per_s, note="", kkt=None):
    rec = {
        "metric": "ANYmal trot whole-body MPC updates/s "
                  f"(N=20, B={os.environ.get('BENCH_B', '128')} "
                  "scenarios, max_iter=2, f32, switching "
                  "constraints, Pallas condense+Riccati+chain, 1 chip; "
                  "vs_baseline = updates/s / 400 Hz reference MPC "
                  "cadence, the reference publishes no absolute number)"
                  + note,
        "value": round(value_updates_per_s, 1),
        "unit": "updates/s",
        # vs the 400 Hz single-core reference MPC cadence (the
        # reference publishes no absolute updates/s; BASELINE.md)
        "vs_baseline": round(value_updates_per_s / 400.0, 2),
    }
    if kkt is not None:
        # BASELINE.md protocol 1: throughput at a recorded KKT error
        rec["fleet_max_kkt"] = float(kkt)
    print(json.dumps(rec), flush=True)


def main():
    from robotoc_tpu.models import load_robot
    from robotoc_tpu.mpc.mpc_trot import MPCTrot
    from robotoc_tpu.solver import ocp_solver as OS

    dtype = jnp.float32
    m = load_robot("anymal", dtype=dtype)
    T, N = 0.5, 20
    mpc = MPCTrot(m, T=T, N=N)
    planner = mpc.make_planner()
    planner.set_gait_pattern(np.array([0.15, 0, 0]), 0.0)
    mpc.set_gait_pattern(planner, swing_height=0.1, swing_time=0.25,
                         stance_time=0.0, swing_start_time=0.5)
    q0 = jnp.asarray([0, 0, 0.4792, 0, 0, 0, 1, -0.1, 0.7, -1.0,
                      -0.1, -0.7, 1.0, 0.1, 0.7, -1.0, 0.1, -0.7, 1.0],
                     dtype)
    v0 = jnp.zeros(18, dtype)
    mpc.planner.init(q0)
    mpc.config_cost = mpc.config_cost.replace(q_ref=q0)
    # mid-gait grid: one lift + one touchdown impact inside the horizon
    grid, costs = mpc._build_schedule_and_costs(0.35, q0, v0)
    solver = OS.OCPSolver(m, mpc.contacts, costs, mpc.limits, T=T, N=N,
                          n_reserved_events=mpc.n_reserved)
    sol0 = solver.init_solution(grid, q0, v0)

    B = int(os.environ.get("BENCH_B", "128"))  # scenario batch (MPC fleet)
    sols = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), sol0)
    key = jax.random.PRNGKey(0)
    dq = 0.03 * jax.random.normal(key, (B, 18), dtype)
    from robotoc_tpu.models import robot as rm
    q0s = jax.vmap(lambda d: rm.integrate(m, q0, d))(dq)
    v0s = jnp.zeros((B, 18), dtype)

    def mpc_update(sol, q0, v0):
        # max_iter=2 Newton updates (reference MPC cadence); scan over the
        # iterations so the update body compiles ONCE (round-1 lesson: an
        # unrolled pair doubled the traced graph and blew the compile
        # budget on the driver's cold cache). Switching constraints ON:
        # the reference imposes the pure-state touchdown constraint on
        # every impact-bearing horizon (time_discretization.cpp:138-142).
        def it(s, _):
            s, kkt, alpha, _ = OS._update(
                m, mpc.contacts, mpc.limits, 1e-3, 0.995, mpc.n_reserved,
                costs, s, grid, q0, v0, enable_sw=True, use_pallas=True,
                use_chain=True)
            return s, kkt

        sol, kkts = jax.lax.scan(it, sol, None, length=2)
        return sol, kkts[-1]

    step = jax.jit(jax.vmap(mpc_update))
    t_c0 = time.perf_counter()
    sols_w, kkt = step(sols, q0s, v0s)
    jax.block_until_ready(kkt)
    compile_s = time.perf_counter() - t_c0
    print(f"# compile+first-run: {compile_s:.1f}s", flush=True)
    if not bool(jnp.all(jnp.isfinite(kkt))):
        raise RuntimeError("non-finite KKT in warmup")

    # one timed rep -> provisional line ASAP
    t0 = time.perf_counter()
    sols_t, kkt = step(sols_w, q0s, v0s)
    jax.block_until_ready(kkt)
    dt1 = time.perf_counter() - t0
    emit(B / dt1, note=" [provisional, 1 rep]",
         kkt=float(jnp.max(kkt)))

    n_rep = 20
    t0 = time.perf_counter()
    for _ in range(n_rep):
        sols_t, kkt = step(sols_t, q0s, v0s)
    jax.block_until_ready(kkt)
    dt_s = (time.perf_counter() - t0) / n_rep
    emit(B / dt_s, kkt=float(jnp.max(kkt)))


if __name__ == "__main__":
    main()
