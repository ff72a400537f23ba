"""ANYmal jump with switching-time optimization.

Reproduction of the reference's examples/anymal/python/jump_sto.py:115-127
configuration (jump_length=[0.5,0,0] scaled to the shorter horizon used
here, dt=0.02 grid density, mesh refinement kkt_tol_mesh=1.0,
max_dt_mesh=T/N) on the TPU-native phase-based STO solver."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

# offline trajectory optimization runs f64 (the reference is
# double-precision throughout; the aggressive 0.5 m jump's constrained
# STO factors are marginal in f32)
jax.config.update("jax_enable_x64", True)
if os.environ.get("JAX_PLATFORMS"):
    # the axon sitecustomize pre-imports jax, so the env var alone is
    # read too late — mirror it into jax.config (same as the other
    # examples); f64 linear algebra needs the CPU backend
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp

from robotoc_tpu.constraints.joint_limits import make_joint_limits
from robotoc_tpu.costs.config_cost import make_config_cost
from robotoc_tpu.models import (forward_kinematics, frame_placement,
                                load_robot)
from robotoc_tpu.models.contacts import make_contacts
from robotoc_tpu.planner.contact_sequence import ContactSchedule
from robotoc_tpu.solver.sto_solver import OCPSolverSTO, STOSolverOptions
from robotoc_tpu.sto.cost import QuadraticSTOCost

FEET = ["LF_FOOT", "LH_FOOT", "RF_FOOT", "RH_FOOT"]


def main():
    m = load_robot("anymal")
    contacts = make_contacts(m, FEET, baumgarte_time_step=0.05)
    nv = m.nv
    jump_length = np.array([0.5, 0.0, 0.0])
    # weights: reference jump_sto.py:32-46
    q0 = jnp.array([0, 0, 0.4792, 0, 0, 0, 1, -0.1, 0.7, -1.0,
                    -0.1, -0.7, 1.0, 0.1, 0.7, -1.0, 0.1, -0.7, 1.0],
                   m.dtype)
    q_ref = q0.at[0:3].add(jnp.asarray(jump_length, m.dtype))
    qw = jnp.asarray([1.0, 0, 0, 1.0, 1.0, 1.0] + [0.001] * (nv - 6),
                     m.dtype)
    qwi = jnp.asarray([0., 0, 0, 100., 100., 100.] + [0.1] * (nv - 6),
                      m.dtype)
    cost = make_config_cost(
        m, q_ref=q_ref, q_weight=qw, v_weight=jnp.full(nv, 1.0, m.dtype),
        a_weight=1e-6, u_weight=1e-2, q_weight_terminal=qw,
        v_weight_terminal=jnp.full(nv, 1.0, m.dtype), q_weight_impact=qwi,
        v_weight_impact=jnp.full(nv, 1.0, m.dtype),
        dv_weight_impact=jnp.full(nv, 1e-6, m.dtype))
    lim = make_joint_limits(m, u_limit=jnp.full(12, 140.0, m.dtype),
                            v_limit=jnp.full(12, 15.0, m.dtype))
    Rw, pw = forward_kinematics(m, q0)
    plc = np.stack([np.asarray(frame_placement(m, m.frame_id(f), Rw, pw)[1])
                    for f in FEET])
    ground_time, flying_time = 0.30, 0.25
    t0, T, N = 0.0, 0.85, 14
    sched = ContactSchedule(nc=4).init([True] * 4, plc)
    sched.push_back([False] * 4, plc, t0 + ground_time, sto=True)
    sched.push_back([True] * 4, plc + jump_length,
                    t0 + ground_time + flying_time, sto=True)
    solver = OCPSolverSTO(
        m, contacts, (cost,), lim, sched, t0, T, N,
        sto_costs=(QuadraticSTOCost(
            ts_ref=jnp.asarray([0.3, 0.55], m.dtype),
            weight=jnp.zeros(2, m.dtype)),),
        min_dwell_times=[0.15, 0.15, 0.1],
        options=STOSolverOptions(max_iter=60, kkt_tol=1e-6,
                                 kkt_tol_mesh=1.0, max_dt_mesh=T / N),
        # the landing-placement switching constraint converges on
        # feasible configurations (tests/test_sto_switching.py: 0.12 m
        # jump, kkt < 1e-6, placement residual <= 1e-6); on THIS
        # compressed horizon (T=0.85 vs the reference jump_sto.py's
        # T~2.0) the 0.5 m landing pins ts2 at the min-dwell bound and
        # the Gauss-Newton step cycles — run the cost-driven landing
        # here, as round 3 did
        switching_constraints=False)
    v0 = jnp.zeros(nv, m.dtype)
    t_start = time.time()
    sol, ts, stats = solver.solve(q0, v0, verbose=True)
    print(f"converged={stats['convergence']} iters={stats['iterations']} "
          f"kkt={stats['kkt_error']:.3e} "
          f"mesh_refinements={stats['mesh_refinements']}")
    print("optimized switching times:", np.asarray(ts),
          " (initial: [%.2f %.2f])" % (ground_time,
                                       ground_time + flying_time))
    print("wall: %.1fs (incl. compile)" % (time.time() - t_start))
    # write a self-contained HTML animation of the optimized trajectory
    # (reference trajectory_viewer.py parity; no viewer server needed)
    from robotoc_tpu.utils.trajectory_viewer import TrajectoryViewer
    grid = solver.disc.grid(ts)
    out = TrajectoryViewer(m, contacts=contacts).write_html(
        "anymal_jump_sto.html", sol.q, dt=float(np.mean(np.asarray(
            grid.dt))), forces=np.asarray(sol.f),
        title="ANYmal jump (STO)")
    print("trajectory animation:", out)


if __name__ == "__main__":
    main()
