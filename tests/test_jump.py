"""Jump OCP (stance -> flight -> landing impact) converges with the
KKT-residual line search (reference: ANYmal jump examples;
the plain Gauss-Newton iteration limit-cycles on this problem class, the
damped update is globally monotone)."""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robotoc_tpu.constraints.joint_limits import make_joint_limits
from robotoc_tpu.costs.config_cost import make_config_cost
from robotoc_tpu.models import forward_kinematics, frame_placement, load_robot
from robotoc_tpu.models.contacts import make_contacts
from robotoc_tpu.planner.contact_sequence import ContactSchedule, discretize
from robotoc_tpu.solver import ocp_solver as OS

FEET = ["LF_FOOT", "LH_FOOT", "RF_FOOT", "RH_FOOT"]
Q0 = jnp.array([0, 0, 0.4792, 0, 0, 0, 1, -0.1, 0.7, -1.0,
                -0.1, -0.7, 1.0, 0.1, 0.7, -1.0, 0.1, -0.7, 1.0])


def test_jump_converges_with_kkt_line_search():
    m = load_robot("anymal")
    contacts = make_contacts(m, FEET, baumgarte_time_step=0.05)
    qw = jnp.array([1.0, 0, 0, 1.0, 1.0, 1.0] + [0.001] * 12)
    qwi = jnp.array([0., 0, 0, 100., 100., 100.] + [0.1] * 12)
    cost = make_config_cost(
        m, q_ref=Q0, q_weight=qw, v_weight=jnp.full(18, 1.0),
        a_weight=1e-6, u_weight=1e-2, q_weight_terminal=qw,
        v_weight_terminal=jnp.full(18, 1.0), q_weight_impact=qwi,
        v_weight_impact=jnp.full(18, 1.0),
        dv_weight_impact=jnp.full(18, 1e-6))
    lim = make_joint_limits(m, u_limit=jnp.full(12, 80.0),
                            v_limit=jnp.full(12, 15.0))
    Rw, pw = forward_kinematics(m, Q0)
    plc = np.stack(
        [np.asarray(frame_placement(m, m.frame_id(f), Rw, pw)[1])
         for f in FEET])
    sched = ContactSchedule(nc=4).init([True] * 4, plc)
    sched.push_back([False] * 4, plc, 0.30)        # lift-off
    sched.push_back([True] * 4, plc, 0.55)         # landing impact
    grid = discretize(sched, 0.0, 0.85, 10, n_reserved=1)
    v0 = jnp.zeros(18)
    sol = OS.make_initial_solution(m, contacts, lim, 1e-3, grid, Q0, v0)
    upd = jax.jit(functools.partial(OS._update, m, contacts, lim, 1e-3,
                                    0.995, True, (cost,),
                                    enable_ls="kkt"))
    ke = jax.jit(functools.partial(OS._kkt_error, m, contacts, lim, 1e-3,
                                   True, (cost,)))
    hist = []
    for _ in range(45):
        sol, kkt, alpha, _ = upd(sol, grid, Q0, v0)
        hist.append(float(ke(sol, grid, Q0, v0)))
    assert hist[-1] < 1e-6, f"kkt history tail: {hist[-5:]}"
    # flight phase: forces off, robot airborne (base z rises)
    imask = np.asarray(grid.contact_mask)
    fly = np.where(imask.sum(1) == 0)[0]
    assert len(fly) > 0
    f = np.asarray(sol.f)
    assert np.allclose(f[fly[:-1]], 0.0, atol=1e-6)
    # landing impact slot: impulse forces present, post-impact foot
    # velocity ~ 0
    imp = int(np.argmax(np.asarray(grid.is_impact)
                        * (np.asarray(grid.imp_mask).sum(1) > 0)))
    lam = np.asarray(sol.f)[imp]
    assert np.max(np.abs(lam)) > 1.0
