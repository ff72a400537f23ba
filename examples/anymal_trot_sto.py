"""ANYmal multi-cycle trot with switching-time optimization.

Reproduction of the reference's examples/anymal/python/trot_sto1.py:
a `cycle`-cycle trot gait laid out as a contact schedule with STO on
every lift-off and touchdown, discrete-time swing-foot and CoM
references baked from the schedule (reference
discrete_time_swing_foot_ref.cpp / discrete_time_com_ref.cpp), friction
cones, and minimum-dwell-time STO constraints
(trot_sto1.py:182-196: min_dt = [0.02] + cycle*[0.2, 0.02, 0.2, 0.02]).

Usage: python examples/anymal_trot_sto.py [--cycles 3] [--max-iter 60]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

# offline trajectory optimization runs f64 on CPU (the reference is
# double-precision throughout)
jax.config.update("jax_enable_x64", True)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp

from robotoc_tpu.constraints.joint_limits import make_joint_limits
from robotoc_tpu.costs.config_cost import make_config_cost
from robotoc_tpu.costs.task_cost import (MultiFrameTaskCost,
                                         make_discrete_time_com_ref,
                                         make_discrete_time_swing_refs)
from robotoc_tpu.models import (com, forward_kinematics, frame_placement,
                                load_robot)
from robotoc_tpu.models.contacts import make_contacts
from robotoc_tpu.planner.contact_sequence import ContactSchedule
from robotoc_tpu.solver.sto_solver import OCPSolverSTO, STOSolverOptions
from robotoc_tpu.sto.cost import QuadraticSTOCost

FEET = ["LF_FOOT", "LH_FOOT", "RF_FOOT", "RH_FOOT"]
LF, LH, RF, RH = 0, 1, 2, 3


def main(cycles=3, max_iter=60, html=True, freeze=False):
    m = load_robot("anymal")
    dtype = m.dtype
    contacts = make_contacts(m, FEET, baumgarte_time_step=0.05)
    nv = m.nv
    # gait parameters: reference trot_sto1.py:17-23
    step_length = np.array([0.15, 0.0, 0.0])
    step_height = 0.1
    swing_time = 0.5
    double_support_time = 0.04
    t0 = double_support_time

    q0 = jnp.asarray([0, 0, 0.4792, 0, 0, 0, 1, -0.1, 0.7, -1.0,
                      -0.1, -0.7, 1.0, 0.1, 0.7, -1.0, 0.1, -0.7, 1.0],
                     dtype)
    # weights: reference trot_sto1.py:31-57
    qw = jnp.asarray([0, 0, 0, 250000, 250000, 250000]
                     + [0.0001] * (nv - 6), dtype)
    vw = jnp.asarray([100.0] * 6 + [1.0] * (nv - 6), dtype)
    qwi = jnp.asarray([1.0] * 6 + [100.0] * (nv - 6), dtype)
    cost = make_config_cost(
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

    # contact schedule: reference trot_sto1.py:115-168 (STO every event)
    sched = ContactSchedule(nc=4, default_friction=0.7)
    sched.init([True] * 4, plc.copy(), t0=0.0)
    pos = plc.copy()
    t = t0
    for c in range(cycles):
        first = c == 0
        # LH/RF swing
        sw1 = [True, False, True, False]  # LF, RH stance
        sched.push_back(sw1, pos.copy(), t, sto=True)
        pos[LH] += (0.5 if first else 1.0) * step_length
        pos[RF] += (0.5 if first else 1.0) * step_length
        sched.push_back([True] * 4, pos.copy(), t + swing_time, sto=True)
        # LF/RH swing
        sw2 = [False, True, False, True]  # LH, RF stance
        sched.push_back(sw2, pos.copy(),
                        t + swing_time + double_support_time, sto=True)
        pos[LF] += step_length
        pos[RH] += step_length
        sched.push_back([True] * 4, pos.copy(),
                        t + 2 * swing_time + double_support_time, sto=True)
        t += 2 * swing_time + 2 * double_support_time

    T = t0 + cycles * (2 * double_support_time + 2 * swing_time)
    dt = 0.02
    N = int(np.floor(T / dt))

    # discrete-time refs baked from the schedule
    # (reference trot_sto1.py:63-95,161-174). The phase boundary times
    # follow the CURRENT switching times via the solver's cost_update_fn
    # hook — the reference's refs are keyed on the grid's phase index and
    # move with the discretization automatically; time-baked refs fight
    # the dts step with their 1e6 task weight and the iteration cycles.
    base_foot_refs = make_discrete_time_swing_refs(sched, T, step_height,
                                                   dtype)
    base_com_ref = make_discrete_time_com_ref(sched, T, plc - com0, dtype)

    def costs_for_ts(ts):
        # jax-traceable: evaluated on the traced ts inside the STO
        # linearization (solver/sto_solver.py cost_update_fn)
        bounds = jnp.concatenate(
            [jnp.zeros(1, dtype), jnp.asarray(ts, dtype),
             jnp.full((1,), T, dtype)])
        frs = jax.tree.map(lambda *x: jnp.stack(x),
                           *[r.replace(bounds=bounds)
                             for r in base_foot_refs])
        tc = MultiFrameTaskCost(
            frame_ids=tuple(m.frame_id(f) for f in FEET),
            foot_weight=jnp.full(3, 1e6, dtype),
            foot_weight_terminal=jnp.zeros(3, dtype),
            foot_weight_impact=jnp.zeros(3, dtype),
            com_weight=jnp.full(3, 1e4, dtype),
            com_weight_terminal=jnp.zeros(3, dtype),
            com_weight_impact=jnp.zeros(3, dtype),
            foot_refs=frs, com_ref=base_com_ref.replace(bounds=bounds))
        return (cost, tc)

    ts0 = np.array([ph.start_time for ph in sched.phases[1:]])
    task_cost = costs_for_ts(ts0)[1]

    n_events = 4 * cycles
    min_dwell = [0.02] + cycles * [0.2, 0.02, 0.2, 0.02]
    solver = OCPSolverSTO(
        m, contacts, (cost, task_cost), lim, sched, 0.0, T, N,
        sto_costs=(QuadraticSTOCost(
            ts_ref=jnp.zeros(n_events, dtype),
            weight=jnp.zeros(n_events, dtype)),),
        min_dwell_times=min_dwell,
        options=STOSolverOptions(max_iter=max_iter, kkt_tol=1e-6,
                                 kkt_tol_mesh=1.0, max_dt_mesh=T / N,
                                 initial_sto_reg_iter=10,
                                 # 4 coupled events: the unregularized
                                 # dts Gauss-Newton step overshoots and
                                 # cycles between two ts clusters; a
                                 # tight trust region converges
                                 max_dts=0.02),
        # with the touchdown placement constraint active the multi-event
        # STO Gauss-Newton step cycles between two ts clusters on this
        # problem (same failure mode the aggressive jump_sto opts out of,
        # solver/sto_solver.py:80-95) — the cost-driven landing converges
        switching_constraints=False,
        cost_update_fn=costs_for_ts)
    v0 = jnp.zeros(nv, dtype)
    ts_nominal = np.array(
        [ph.start_time for ph in sched.phases[1:]])
    t_start = time.time()
    # phase 0: converge the TRAJECTORY at the nominal switching times
    # with the KKT-backtracking line search (the cold multi-event gait
    # start stalls the STO update's merit backtracking at alpha -> 0;
    # the same recipe converges examples/anymal_bounce.py)
    import functools

    from robotoc_tpu.solver import ocp_solver as OS
    grid0 = solver.disc.grid(jnp.asarray(ts0, dtype))
    sol = solver.init_solution(q0, v0)
    upd0 = jax.jit(functools.partial(
        OS._update, m, contacts, lim, 1e-3, 0.995,
        solver.disc.n_impact_slots, enable_ls="kkt"))
    costs0 = costs_for_ts(ts0)
    kkt_tr = None
    for k in range(220):
        sol, kkt_tr, _, _ = upd0(costs0, sol, grid0, q0, v0)
    print(f"trajectory warmup: kkt {float(kkt_tr):.3e}")

    sol, ts, stats = solver.solve(q0, v0, sol=sol, verbose=True,
                                  freeze_ts=freeze)
    print(f"STO phase: iters={stats['iterations']} "
          f"kkt={stats['kkt_error']:.3e} "
          f"ts={np.round(np.asarray(ts), 4)}")
    # polish the trajectory at the optimized switching times (frozen ts):
    # with 4 coupled events the trust-region STO phase locates the times
    # to ~5 ms but each of its iterations takes only ONE Newton step on
    # the trajectory, which therefore lags the moving grid
    sol, ts, stats = solver.solve(q0, v0, sol=sol, ts=ts, freeze_ts=True)
    print(f"polish:    converged={stats['convergence']} "
          f"iters={stats['iterations']} kkt={stats['kkt_error']:.3e} "
          f"mesh_refinements={stats['mesh_refinements']}")
    print("optimized switching times:", np.round(np.asarray(ts), 4))
    print("nominal switching times:  ", np.round(ts_nominal, 4))
    print("wall: %.1fs (incl. compile)" % (time.time() - t_start))
    if html:
        from robotoc_tpu.utils.trajectory_viewer import TrajectoryViewer
        grid = solver.disc.grid(ts)
        out = TrajectoryViewer(m, contacts=contacts).write_html(
            "anymal_trot_sto.html", sol.q,
            dt=float(np.mean(np.asarray(grid.dt))),
            forces=np.asarray(sol.f), title="ANYmal trot (STO)")
        print("trajectory animation:", out)
    return sol, ts, stats


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--cycles", type=int, default=3)
    p.add_argument("--max-iter", type=int, default=60)
    p.add_argument("--no-html", action="store_true")
    p.add_argument("--freeze", action="store_true",
                   help="keep the switching times at their nominal "
                        "values (trajectory-only solve)")
    a = p.parse_args()
    main(cycles=a.cycles, max_iter=a.max_iter, html=not a.no_html,
         freeze=a.freeze)
