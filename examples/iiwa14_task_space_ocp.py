"""iiwa14 task-space OCP: drive the end effector to a world target.

Reproduction of the reference's examples/iiwa14/task_space_ocp.cpp shape
(task-space tracking cost on the end-effector frame + config-space
regularization, UnconstrOCPSolver) — exercises the generic cost container
in the unconstrained pipeline."""
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from robotoc_tpu.constraints.joint_limits import make_joint_limits
from robotoc_tpu.costs.config_cost import make_config_cost
from robotoc_tpu.costs.task_cost import ConstantRef, TaskSpace3DCost
from robotoc_tpu.models import frame_position, load_robot
from robotoc_tpu.solver.unconstr_ocp_solver import UnconstrOCPSolver


def main():
    m = load_robot("iiwa14")
    ee = m.frame_names[-1]
    fid = m.frame_id(ee)
    q0 = jnp.array([0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5], m.dtype)
    p0 = frame_position(m, fid, q0)
    target = p0 + jnp.asarray([0.1, 0.1, -0.1], m.dtype)
    cost_cfg = make_config_cost(m, q_ref=q0, q_weight=0.1, v_weight=0.01,
                                a_weight=0.01, q_weight_terminal=0.1,
                                v_weight_terminal=0.01)
    w3 = jnp.full(3, 1000.0, m.dtype)
    cost_task = TaskSpace3DCost(frame_id=fid, weight=w3,
                                weight_terminal=10.0 * w3,
                                weight_impact=w3, ref=ConstantRef(p=target))
    lim = make_joint_limits(m, u_limit=jnp.full(7, 100.0, m.dtype),
                            v_limit=jnp.full(7, math.pi, m.dtype))
    solver = UnconstrOCPSolver(m, (cost_cfg, cost_task), lim, T=1.5, N=30)
    v0 = jnp.zeros(7, m.dtype)
    t0 = time.time()
    sol, stats = solver.solve(q0, v0)
    pT = frame_position(m, fid, sol.q[-1])
    print(f"converged: kkt={float(stats['kkt_error']):.3e} "
          f"iters={int(stats['iterations'])} "
          f"wall={time.time() - t0:.1f}s (incl. compile)")
    print("end-effector final:", np.asarray(pT), " target:",
          np.asarray(target),
          " err:", float(jnp.linalg.norm(pT - target)))


if __name__ == "__main__":
    main()
