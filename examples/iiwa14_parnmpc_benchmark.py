"""iiwa14 solver benchmark: UnconstrOCPSolver (Riccati) vs
UnconstrParNMPCSolver (time-parallel backward correction).

Reproduction of the reference's examples/iiwa14/unconstr_ocp_benchmark.cpp +
unconstr_parnmpc_benchmark.cpp pair (same cost/constraint/T/N/state config):
times per-update ms and updates/s for both solvers at matching final KKT
error. On TPU the ParNMPC coarse step is one batched MXU KKT inversion,
which is the regime the reference calls "possibly very efficient when the
number of available CPU cores is very large" (doc/features.dox:75)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from robotoc_tpu.constraints.joint_limits import make_joint_limits
from robotoc_tpu.costs.config_cost import make_config_cost
from robotoc_tpu.models import load_robot
from robotoc_tpu.parnmpc.solver import UnconstrParNMPCSolver
from robotoc_tpu.solver.unconstr_ocp_solver import UnconstrOCPSolver


def time_updates(fn, n=100):
    fn()  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    m = load_robot("iiwa14")
    nv = m.nv
    # config: reference unconstr_parnmpc_benchmark.cpp:30-38 (q_ref=-5,
    # v_ref=-9 clipped into limits here, weights 10/0.1/0.01, u_limit 200)
    cost = make_config_cost(
        m, q_ref=jnp.full(m.nq, -1.0, m.dtype),
        q_weight=10.0, v_weight=0.1, a_weight=0.01,
        q_weight_terminal=10.0, v_weight_terminal=0.1)
    lim = make_joint_limits(m, u_limit=jnp.full(nv, 200.0, m.dtype))
    T, N = 1.0, 20
    q = jnp.full(m.nq, 1.0, m.dtype)
    v = jnp.zeros(nv, m.dtype)

    riccati = UnconstrOCPSolver(m, cost, lim, T=T, N=N)
    parnmpc = UnconstrParNMPCSolver(m, cost, lim, T=T, N=N)

    sol_r, stats_r = riccati.solve(q, v)
    sol_p, stats_p = parnmpc.solve(q, v)
    print(f"Riccati : iters={int(stats_r['iterations'])} "
          f"kkt={float(stats_r['kkt_error']):.3e}")
    print(f"ParNMPC : iters={int(stats_p['iterations'])} "
          f"kkt={float(stats_p['kkt_error']):.3e}")

    sol_r0 = riccati.init_solution(q, v)
    sol_p0 = parnmpc.init_solution(q, v)
    dt_r = time_updates(lambda: riccati._solve(sol_r0, q, v)[0].q)
    dt_p = time_updates(lambda: parnmpc._update(sol_p0, q, v)[0].q)
    # full-solve timing for Riccati; per-update timing for ParNMPC
    print(f"Riccati full solve: {dt_r * 1e3:.3f} ms "
          f"({1.0 / dt_r:.1f} solves/s)")
    print(f"ParNMPC update:     {dt_p * 1e3:.3f} ms "
          f"({1.0 / dt_p:.1f} updates/s)")


if __name__ == "__main__":
    main()
