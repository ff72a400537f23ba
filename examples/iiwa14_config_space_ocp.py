"""iiwa14 configuration-space OCP (reference: examples/iiwa14/config_space_ocp.cpp)."""
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from robotoc_tpu.constraints.joint_limits import make_joint_limits
from robotoc_tpu.costs.config_cost import make_config_cost
from robotoc_tpu.models import load_robot
from robotoc_tpu.solver.unconstr_ocp_solver import UnconstrOCPSolver

def main():
    m = load_robot("iiwa14", dtype=jnp.float64
                   if jax.config.read("jax_enable_x64") else jnp.float32)
    q_ref = jnp.array([0, math.pi / 2, 0, math.pi / 2, 0, math.pi / 2, 0],
                      m.dtype)
    cost = make_config_cost(m, q_ref=q_ref, q_weight=10, v_weight=0.01,
                            a_weight=0.01, q_weight_terminal=10,
                            v_weight_terminal=0.01)
    lim = make_joint_limits(m, u_limit=jnp.full(7, 50.0, m.dtype),
                            v_limit=jnp.full(7, math.pi / 2, m.dtype))
    solver = UnconstrOCPSolver(m, cost, lim, T=3.0, N=60)
    q0 = jnp.array([math.pi / 2, 0, math.pi / 2, 0, math.pi / 2, 0,
                    math.pi / 2], m.dtype)
    v0 = jnp.zeros(7, m.dtype)
    sol = solver.init_solution(q0, v0)
    print("Initial KKT error:", solver.kkt_error(sol, q0, v0))
    t0 = time.time()
    sol, stats = solver.solve(q0, v0)
    print("KKT error after convergence:", float(stats["kkt_error"]))
    print("iterations:", int(stats["iterations"]),
          " wall: %.3fs (incl. compile)" % (time.time() - t0))
    t0 = time.time()
    solver.solve(q0, v0)
    print("cached solve: %.4fs" % (time.time() - t0))

if __name__ == "__main__":
    main()
