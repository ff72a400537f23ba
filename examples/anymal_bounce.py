"""ANYmal multi-cycle bounce gait (offline whole-body OCP).

Reproduction of the reference's examples/anymal/python/bounce.py: the
hind pair (LH, RH) and front pair (LF, RF) alternate swings —
step_length [0.275, 0, 0], step_height 0.125, swing 0.26 s, double
support 0.04 s — laid out as a fixed contact schedule with touchdown
impacts, periodic swing-foot / CoM references, friction cones, and a
full Newton solve with the KKT line search.

Usage: python examples/anymal_bounce.py [--cycles 3] [--max-iter 200]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp

from robotoc_tpu.constraints.joint_limits import make_joint_limits
from robotoc_tpu.costs.config_cost import make_config_cost
from robotoc_tpu.costs.task_cost import (MultiFrameTaskCost,
                                         PeriodicCoMRef,
                                         PeriodicSwingFootRef)
from robotoc_tpu.models import (com, forward_kinematics, frame_placement,
                                load_robot)
from robotoc_tpu.models.contacts import make_contacts
from robotoc_tpu.planner.contact_sequence import (ContactSchedule,
                                                  discretize)
from robotoc_tpu.solver.ocp_solver import OCPSolver, SolverOptions

FEET = ["LF_FOOT", "LH_FOOT", "RF_FOOT", "RH_FOOT"]
LF, LH, RF, RH = 0, 1, 2, 3


def main(cycles=3, max_iter=200, html=True):
    m = load_robot("anymal")
    dtype = m.dtype
    contacts = make_contacts(m, FEET, baumgarte_time_step=0.05)
    nv = m.nv
    # gait parameters: reference bounce.py:17-23
    step_length = np.array([0.275, 0.0, 0.0])
    step_height = 0.125
    swing_time = 0.26
    double_support_time = 0.04
    t0 = 0.1

    q0 = jnp.asarray([0, 0, 0.4792, 0, 0, 0, 1, -0.1, 0.7, -1.0,
                      -0.1, -0.7, 1.0, 0.1, 0.7, -1.0, 0.1, -0.7, 1.0],
                     dtype)
    qw = jnp.asarray([0, 0, 0, 250000, 250000, 250000]
                     + [0.0001] * (nv - 6), dtype)
    vw = jnp.asarray([100.0] * 6 + [1.0] * (nv - 6), dtype)
    qwi = jnp.asarray([1.0] * 6 + [100.0] * (nv - 6), dtype)
    config_cost = make_config_cost(
        m, q_ref=q0, q_weight=qw, v_weight=vw, a_weight=1e-6,
        u_weight=1e-1, q_weight_terminal=qw, v_weight_terminal=vw,
        q_weight_impact=qwi, v_weight_impact=jnp.full(nv, 100.0, dtype),
        dv_weight_impact=jnp.full(nv, 1e-6, dtype))
    lim = make_joint_limits(m, u_limit=jnp.full(12, 80.0, dtype),
                            v_limit=jnp.full(12, 15.0, dtype))

    Rw, pw = forward_kinematics(m, q0)
    plc = np.stack([np.asarray(frame_placement(m, m.frame_id(f), Rw, pw)[1])
                    for f in FEET])
    com0 = np.asarray(com(m, q0))

    # periodic refs: reference bounce.py:65-102 (hind pair starts at t0,
    # front pair one half-cycle later; both advance a full step)
    period_full = 2.0 * swing_time + 2.0 * double_support_time
    sl = jnp.asarray(step_length, dtype)
    sh = jnp.asarray(step_height, dtype)

    def swing_ref(i, t_start):
        return PeriodicSwingFootRef(
            p0=jnp.asarray(plc[i], dtype), step_length=sl, step_height=sh,
            t0=jnp.asarray(t_start, dtype),
            period_swing=jnp.asarray(swing_time, dtype),
            period=jnp.asarray(period_full, dtype))

    front_t0 = t0 + swing_time + double_support_time
    refs = [swing_ref(LF, front_t0), swing_ref(LH, t0),
            swing_ref(RF, front_t0), swing_ref(RH, t0)]
    foot_refs = jax.tree.map(lambda *x: jnp.stack(x), *refs)
    com_ref = PeriodicCoMRef(
        com0=jnp.asarray(com0, dtype),
        vcom=jnp.asarray(0.5 * step_length / swing_time, dtype),
        t0=jnp.asarray(t0, dtype),
        period_active=jnp.asarray(swing_time, dtype),
        period_inactive=jnp.asarray(double_support_time, dtype))
    task_cost = MultiFrameTaskCost(
        frame_ids=tuple(m.frame_id(f) for f in FEET),
        foot_weight=jnp.full(3, 1e6, dtype),
        foot_weight_terminal=jnp.zeros(3, dtype),
        foot_weight_impact=jnp.zeros(3, dtype),
        com_weight=jnp.full(3, 1e6, dtype),
        com_weight_terminal=jnp.zeros(3, dtype),
        com_weight_impact=jnp.zeros(3, dtype),
        foot_refs=foot_refs, com_ref=com_ref)

    # contact schedule: reference bounce.py:125-160
    sched = ContactSchedule(nc=4, default_friction=0.7)
    sched.init([True] * 4, plc.copy(), t0=0.0)
    pos = plc.copy()
    t = t0
    for _ in range(cycles):
        sched.push_back([True, False, True, False], pos.copy(), t)
        pos[LH] += step_length
        pos[RH] += step_length
        sched.push_back([True] * 4, pos.copy(), t + swing_time)
        sched.push_back([False, True, False, True], pos.copy(),
                        t + swing_time + double_support_time)
        pos[LF] += step_length
        pos[RF] += step_length
        sched.push_back([True] * 4, pos.copy(),
                        t + 2 * swing_time + double_support_time)
        t += 2 * swing_time + 2 * double_support_time

    T = t0 + cycles * (2 * double_support_time + 2 * swing_time)
    N = int(np.floor(T / 0.02))
    n_impacts = 2 * cycles
    grid = discretize(sched, 0.0, T, N, n_reserved=n_impacts,
                      dtype=dtype)
    solver = OCPSolver(
        m, contacts, (config_cost, task_cost), lim, T=T, N=N,
        options=SolverOptions(max_iter=max_iter, kkt_tol=1e-6,
                              enable_line_search="kkt"),
        n_reserved_events=n_impacts)
    v0 = jnp.zeros(nv, dtype)
    t_start = time.time()
    sol, st = solver.solve(grid, q0, v0)
    print(f"converged={bool(st['convergence'])} "
          f"iters={int(st['iterations'])} "
          f"kkt={float(st['kkt_error']):.3e}")
    print("wall: %.1fs (incl. compile)" % (time.time() - t_start))
    if html:
        from robotoc_tpu.utils.trajectory_viewer import TrajectoryViewer
        out = TrajectoryViewer(m, contacts=contacts).write_html(
            "anymal_bounce.html", sol.q,
            dt=float(np.mean(np.asarray(grid.dt))),
            forces=np.asarray(sol.f), title="ANYmal bounce")
        print("trajectory animation:", out)
    return sol, st


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--cycles", type=int, default=3)
    p.add_argument("--max-iter", type=int, default=200)
    p.add_argument("--no-html", action="store_true")
    a = p.parse_args()
    main(cycles=a.cycles, max_iter=a.max_iter, html=not a.no_html)
