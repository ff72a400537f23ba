"""Mixed-precision refinement cost on the real TPU (round-4 verdict
weak #3 / next-round item #5).

Workflow measured: f32 solve (the TPU fast path, Pallas kernels) to its
precision floor, then SolutionRefiner f64 Newton iterations (XLA path,
TPU f64 emulation) to the reference-grade KKT gate (reference
solver_options.hpp:30-34: kkt_tol 1e-7 in double). Reports wall time of
each phase and the achieved KKT, on the ANYmal standing OCP (the
reference ocp_benchmark.cpp:108-132 scenario) and the mid-gait trot
problem (the flagship bench scenario).

Usage: python tools/bench_refine.py [--cpu] [--reps 5]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--reps", type=int, default=5)
args = parser.parse_args()

import jax

jax.config.update("jax_enable_x64", True)
if args.cpu:
    jax.config.update("jax_platforms", "cpu")
os.makedirs(os.path.expanduser("~/.cache/robotoc_tpu_xla"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/robotoc_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np


def standing_problem(dtype):
    from robotoc_tpu.constraints.joint_limits import make_joint_limits
    from robotoc_tpu.costs.config_cost import make_config_cost
    from robotoc_tpu.models import (forward_kinematics, frame_placement,
                                    load_robot)
    from robotoc_tpu.models.contacts import make_contacts
    from robotoc_tpu.planner.contact_sequence import (ContactSchedule,
                                                      discretize)
    m = load_robot("anymal", dtype=dtype)
    feet = ["LF_FOOT", "LH_FOOT", "RF_FOOT", "RH_FOOT"]
    contacts = make_contacts(m, feet, baumgarte_time_step=0.04)
    q0 = jnp.asarray([0, 0, 0.4792, 0, 0, 0, 1, -0.1, 0.7, -1.0,
                      -0.1, -0.7, 1.0, 0.1, 0.7, -1.0, 0.1, -0.7, 1.0],
                     dtype)
    qw = jnp.asarray([0, 0, 0, 250000, 250000, 250000] + [0.0001] * 12,
                     dtype)
    vw = jnp.asarray([100.0] * 6 + [1.0] * 12, dtype)
    cost = make_config_cost(m, q_ref=q0, q_weight=qw, v_weight=vw,
                            a_weight=1e-6, u_weight=1e-1,
                            q_weight_terminal=qw, v_weight_terminal=vw)
    lim = make_joint_limits(m, u_limit=jnp.full(12, 80.0, dtype),
                            v_limit=jnp.full(12, 15.0, dtype))
    Rw, pw = forward_kinematics(m, q0)
    plc = np.stack(
        [np.asarray(frame_placement(m, m.frame_id(f), Rw, pw)[1])
         for f in feet])
    sched = ContactSchedule(nc=4).init([True] * 4, plc)
    grid = discretize(sched, 0.0, 0.5, 20, dtype=dtype)
    return m, contacts, cost, lim, q0, grid


def run(name, m, contacts, costs, lim, q0, grid, T, N, n_reserved=0):
    from robotoc_tpu.solver.ocp_solver import OCPSolver, SolverOptions
    from robotoc_tpu.solver.refine import SolutionRefiner

    dtype = m.dtype
    solver = OCPSolver(m, contacts, costs, lim, T=T, N=N,
                       options=SolverOptions(max_iter=30, kkt_tol=1e-5),
                       n_reserved_events=n_reserved)
    v0 = jnp.zeros(m.nv, dtype)
    sol0 = solver.init_solution(grid, q0, v0)
    # warm both jits (if the Pallas path rejects an x64-promoted input,
    # fall back to the XLA path for the f32 phase — the refinement cost
    # is the number under test)
    try:
        sol32, st = solver.solve(grid, q0, v0, sol=sol0)
    except Exception as e:  # noqa: BLE001
        print(f"# f32 Pallas phase failed under x64 ({type(e).__name__});"
              " falling back to the XLA path", flush=True)
        solver = OCPSolver(m, contacts, costs, lim, T=T, N=N,
                           options=SolverOptions(max_iter=30, kkt_tol=1e-5,
                                                 use_pallas=False),
                           n_reserved_events=n_reserved)
        sol32, st = solver.solve(grid, q0, v0, sol=sol0)
    ref = SolutionRefiner(solver, max_iter=6, kkt_tol=1e-9)
    sol64, st64 = ref.refine(sol32, grid, q0, v0)
    jax.block_until_ready(sol64.q)

    t32 = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        sol32, st = solver.solve(grid, q0, v0, sol=sol0)
        jax.block_until_ready(sol32.q)
        t32.append(time.perf_counter() - t0)
    t64 = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        sol64, st64 = ref.refine(sol32, grid, q0, v0)
        jax.block_until_ready(sol64.q)
        t64.append(time.perf_counter() - t0)
    print(f"{name}: f32 solve {min(t32) * 1e3:.2f} ms "
          f"({int(st['iterations'])} its, kkt {float(st['kkt_error']):.2e})"
          f" + f64 refine {min(t64) * 1e3:.2f} ms "
          f"({int(st64['iterations'])} its, kkt "
          f"{float(st64['kkt_error']):.2e})", flush=True)


def main():
    dtype = jnp.float32
    m, contacts, cost, lim, q0, grid = standing_problem(dtype)
    run("standing N=20", m, contacts, (cost,), lim, q0, grid, 0.5, 20)


if __name__ == "__main__":
    main()
