"""STO with switching constraints (VERDICT round-3 item #5).

The reference imposes the pure-state switching constraint on every
impact-bearing horizon unconditionally, including the jump-STO scenarios
(reference src/ocp/time_discretization.cpp:138-142,
src/ocp/intermediate_stage.cpp:124, src/dynamics/switching_constraint.cpp:
7-62). This test solves a compact ANYmal jump with the switching times as
decision variables AND the landing-placement constraint active, and pins:

  * convergence of the coupled (solution, ts) Newton iteration,
  * engaged switching multipliers xi,
  * touchdown placement residual at the predicted config <= 1e-6,
  * a NON-degenerate KKT residual at convergence (round-3 Weak #3: the
    old difference-of-squares correction could floor the metric to 0.0).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robotoc_tpu.constraints.joint_limits import make_joint_limits
from robotoc_tpu.costs.config_cost import make_config_cost
from robotoc_tpu.dynamics import switching_constraint as swc
from robotoc_tpu.models import (forward_kinematics, frame_placement,
                                load_robot)
from robotoc_tpu.models.contacts import make_contacts
from robotoc_tpu.planner.contact_sequence import ContactSchedule
from robotoc_tpu.solver.sto_solver import OCPSolverSTO, STOSolverOptions

FEET = ["LF_FOOT", "LH_FOOT", "RF_FOOT", "RH_FOOT"]
Q0 = jnp.array([0, 0, 0.4792, 0, 0, 0, 1, -0.1, 0.7, -1.0,
                -0.1, -0.7, 1.0, 0.1, 0.7, -1.0, 0.1, -0.7, 1.0])


@pytest.mark.slow
def test_jump_sto_with_switching_constraints():
    m = load_robot("anymal")
    contacts = make_contacts(m, FEET, baumgarte_time_step=0.05)
    nv = m.nv
    jump_length = np.array([0.12, 0.0, 0.0])
    q_ref = Q0.at[0:3].add(jnp.asarray(jump_length, m.dtype))
    qw = jnp.asarray([1.0, 0, 0, 1.0, 1.0, 1.0] + [0.001] * (nv - 6))
    qwi = jnp.asarray([0., 0, 0, 100., 100., 100.] + [0.1] * (nv - 6))
    cost = make_config_cost(
        m, q_ref=q_ref, q_weight=qw, v_weight=jnp.full(nv, 1.0),
        a_weight=1e-6, u_weight=1e-2, q_weight_terminal=qw,
        v_weight_terminal=jnp.full(nv, 1.0), q_weight_impact=qwi,
        v_weight_impact=jnp.full(nv, 1.0),
        dv_weight_impact=jnp.full(nv, 1e-6))
    lim = make_joint_limits(m, u_limit=jnp.full(12, 140.0),
                            v_limit=jnp.full(12, 15.0))
    Rw, pw = forward_kinematics(m, Q0)
    plc = np.stack(
        [np.asarray(frame_placement(m, m.frame_id(f), Rw, pw)[1])
         for f in FEET])
    plc_land = plc + jump_length
    t0, T, N = 0.0, 0.8, 10
    sched = ContactSchedule(nc=4).init([True] * 4, plc)
    sched.push_back([False] * 4, plc, 0.30, sto=True)
    sched.push_back([True] * 4, plc_land, 0.55, sto=True)
    solver = OCPSolverSTO(
        m, contacts, (cost,), lim, sched, t0, T, N,
        min_dwell_times=[0.1, 0.1, 0.1],
        options=STOSolverOptions(max_iter=140, kkt_tol=1e-6,
                                 initial_sto_reg_iter=6),
        switching_constraints=True)
    assert solver.enable_sw and solver.disc.n_impact_slots == 1
    sol, ts, stats = solver.solve(Q0, jnp.zeros(nv))
    assert stats["convergence"], stats
    # non-degenerate residual: sum-of-squares rebuild cannot floor to 0
    assert 0.0 < stats["kkt_error"] < 1e-6

    # switching multipliers engaged
    assert float(jnp.max(jnp.abs(sol.xi))) > 1e-8

    # touchdown placement residual at the predicted configuration
    grid = solver.disc.grid(ts)
    imp = int(np.argmax(np.asarray(grid.is_impact)
                        * (np.asarray(grid.imp_mask).sum(1) > 0)))
    isw = imp - 2
    q_pred = swc.predicted_config(m, sol.q[isw], sol.v[isw], sol.a[isw],
                                  grid.dt[isw], grid.dt[isw + 1])
    perr = swc.placement_error(m, contacts, q_pred,
                               jnp.asarray(plc_land),
                               jnp.broadcast_to(jnp.eye(3), (4, 3, 3)))
    np.testing.assert_allclose(np.asarray(perr), 0.0, atol=1e-6)

    # the switching times moved from their initial guess
    assert float(jnp.max(jnp.abs(ts - solver.disc.ts0))) > 1e-4
