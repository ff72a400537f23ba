"""ANYmal 4-contact standing OCP (reference: examples/anymal/ocp_benchmark.cpp
configuration: T=0.5, N=20, 4 point contacts)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from robotoc_tpu.constraints.joint_limits import make_joint_limits
from robotoc_tpu.costs.config_cost import make_config_cost
from robotoc_tpu.models import (forward_kinematics, frame_placement,
                                load_robot)
from robotoc_tpu.models.contacts import make_contacts
from robotoc_tpu.planner.contact_sequence import ContactSchedule, discretize
from robotoc_tpu.solver.ocp_solver import OCPSolver

def main():
    m = load_robot("anymal")
    feet = ["LF_FOOT", "LH_FOOT", "RF_FOOT", "RH_FOOT"]
    contacts = make_contacts(m, feet, baumgarte_time_step=0.04)
    q0 = jnp.array([0, 0, 0.4792, 0, 0, 0, 1, -0.1, 0.7, -1.0,
                    -0.1, -0.7, 1.0, 0.1, 0.7, -1.0, 0.1, -0.7, 1.0],
                   m.dtype)
    qw = jnp.asarray([0, 0, 0, 250000, 250000, 250000] + [0.0001] * 12,
                     m.dtype)
    vw = jnp.asarray([100.0] * 6 + [1.0] * 12, m.dtype)
    cost = make_config_cost(m, q_ref=q0, q_weight=qw, v_weight=vw,
                            a_weight=1e-6, u_weight=1e-1,
                            q_weight_terminal=qw, v_weight_terminal=vw)
    lim = make_joint_limits(m, u_limit=jnp.full(12, 80.0, m.dtype),
                            v_limit=jnp.full(12, 15.0, m.dtype))
    Rw, pw = forward_kinematics(m, q0)
    placements = np.stack(
        [np.asarray(frame_placement(m, m.frame_id(f), Rw, pw)[1])
         for f in feet])
    sched = ContactSchedule(nc=4).init([True] * 4, placements)
    grid = discretize(sched, 0.0, 0.5, 20, dtype=m.dtype)
    solver = OCPSolver(m, contacts, (cost,), lim, T=0.5, N=20)
    v0 = jnp.zeros(18, m.dtype)
    t0 = time.time()
    sol, stats = solver.solve(grid, q0, v0)
    print("iterations:", int(stats["iterations"]),
          "KKT:", float(stats["kkt_error"]),
          "wall: %.1fs (incl. compile)" % (time.time() - t0))
    t0 = time.time()
    solver.solve(grid, q0, v0)
    print("cached solve: %.4fs" % (time.time() - t0))
    print("stance forces fz:", np.asarray(sol.f[0]).reshape(4, 3)[:, 2])

if __name__ == "__main__":
    main()
