"""Pallas chain kernel vs the XLA jacfwd chain (models/contacts).

The hand-propagated structured tangents must reproduce
fused_stage_derivatives exactly: values, q/v/a Jacobians, cone rows and
task rows, on random ANYmal states. Interpreter mode on CPU (f64); the
compiled path is exercised by bench.py on TPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robotoc_tpu.models import load_robot
from robotoc_tpu.models import contacts as ct
from robotoc_tpu.models import robot as rm
from robotoc_tpu.ops import pallas_chain as pch


@pytest.fixture(scope="module")
def setup():
    m = load_robot("anymal")
    contacts = ct.make_contacts(
        m, ("LF_FOOT", "LH_FOOT", "RF_FOOT", "RH_FOOT"))
    return m, contacts


def _random_states(m, contacts, S, key):
    ks = jax.random.split(key, 5)
    q0 = jnp.asarray([0, 0, 0.4792, 0, 0, 0, 1, -0.1, 0.7, -1.0,
                      -0.1, -0.7, 1.0, 0.1, 0.7, -1.0, 0.1, -0.7, 1.0],
                     m.dtype)
    dq = 0.4 * jax.random.normal(ks[0], (S, m.nv), m.dtype)
    q = jax.vmap(lambda d: rm.integrate(m, q0, d))(dq)
    v = jax.random.normal(ks[1], (S, m.nv), m.dtype)
    a = jax.random.normal(ks[2], (S, m.nv), m.dtype)
    f = 30.0 * jax.random.normal(ks[3], (S, contacts.max_dimf), m.dtype)
    fric = 0.5 + 0.3 * jax.random.uniform(ks[4], (S, contacts.n_contacts),
                                          dtype=m.dtype)
    p_ref = 0.3 * jax.random.normal(ks[4], (S, contacts.n_contacts, 3),
                                    m.dtype)
    return q, v, a, f, fric, p_ref


def test_chain_matches_jacfwd(setup):
    m, contacts = setup
    S = 7
    q, v, a, f, fric, p_ref = _random_states(m, contacts, S,
                                             jax.random.PRNGKey(0))
    fn = pch.get_chain(m, contacts)
    out = jax.jit(fn)(q, v, a, f, fric, p_ref)

    def ref_one(qq, vv, aa, ff, fr, pr):
        res = ct.fused_stage_derivatives(m, contacts, qq, vv, aa, ff,
                                         fr, pr, None, with_task=True)
        ((tau, C, g, dgdf), (dIDdq, dIDdv, M),
         (dCdq, dCdv, J), dgdq) = res[:4]
        task, dtask = res[4]
        return dict(tau=tau, dtau_dq=dIDdq, dtau_dv=dIDdv, M=M, C=C,
                    dCdq=dCdq, dCdv=dCdv, J=J, g=g, dgdq=dgdq,
                    dgdf=dgdf, task=task, dtask=dtask)

    ref = jax.jit(jax.vmap(ref_one))(q, v, a, f, fric, p_ref)
    for name in out:
        np.testing.assert_allclose(
            np.asarray(out[name]), np.asarray(ref[name]),
            rtol=1e-8, atol=1e-9, err_msg=name)


def test_chain_under_fleet_vmap(setup):
    m, contacts = setup
    B, S = 3, 4
    q, v, a, f, fric, p_ref = _random_states(m, contacts, B * S,
                                             jax.random.PRNGKey(1))
    rs = lambda x: x.reshape((B, S) + x.shape[1:])
    fn = pch.get_chain(m, contacts)
    flat = jax.jit(fn)(q, v, a, f, fric, p_ref)
    nested = jax.jit(jax.vmap(fn))(rs(q), rs(v), rs(a), rs(f), rs(fric),
                                   rs(p_ref))
    for name in flat:
        np.testing.assert_allclose(
            np.asarray(nested[name]).reshape(flat[name].shape),
            np.asarray(flat[name]), rtol=1e-12, err_msg=name)


@pytest.fixture(scope="module")
def setup_surface():
    m = load_robot("icub")
    contacts = ct.make_contacts(m, ("l_sole", "r_sole"),
                                types=(ct.SURFACE, ct.SURFACE),
                                rect=(0.1, 0.05))
    return m, contacts


def _random_surface_states(m, contacts, S, key):
    ks = jax.random.split(key, 6)
    q0 = rm.neutral(m)
    dq = 0.3 * jax.random.normal(ks[0], (S, m.nv), m.dtype)
    q = jax.vmap(lambda d: rm.integrate(m, q0, d))(dq)
    v = jax.random.normal(ks[1], (S, m.nv), m.dtype)
    a = jax.random.normal(ks[2], (S, m.nv), m.dtype)
    f = 30.0 * jax.random.normal(ks[3], (S, contacts.max_dimf), m.dtype)
    fric = 0.5 + 0.3 * jax.random.uniform(ks[4], (S, contacts.n_contacts),
                                          dtype=m.dtype)
    p_ref = 0.3 * jax.random.normal(ks[5], (S, contacts.n_contacts, 3),
                                    m.dtype)
    # small random reference rotations (the walking regime)
    from robotoc_tpu.ops import lie
    w = 0.2 * jax.random.normal(ks[5], (S, contacts.n_contacts, 3),
                                m.dtype)
    R_ref = lie.so3_exp(w)
    return q, v, a, f, fric, p_ref, R_ref


def test_chain_surface_matches_jacfwd(setup_surface):
    """Surface-contact chain kernel (se3_log Baumgarte + 17-row wrench
    cone, round-4 verdict item #2) vs the XLA fused path on iCub
    (reference surface_contact.hxx, contact_wrench_cone.cpp)."""
    m, contacts = setup_surface
    assert pch.chain_supported(m, contacts)
    S = 5
    q, v, a, f, fric, p_ref, R_ref = _random_surface_states(
        m, contacts, S, jax.random.PRNGKey(2))
    fn = pch.get_chain(m, contacts)
    out = jax.jit(fn)(q, v, a, f, fric, p_ref, R_ref)

    def ref_one(qq, vv, aa, ff, fr, pr, Rr):
        res = ct.fused_stage_derivatives(m, contacts, qq, vv, aa, ff,
                                         fr, pr, Rr, with_task=True)
        ((tau, C, g, dgdf), (dIDdq, dIDdv, M),
         (dCdq, dCdv, J), dgdq) = res[:4]
        task, dtask = res[4]
        return dict(tau=tau, dtau_dq=dIDdq, dtau_dv=dIDdv, M=M, C=C,
                    dCdq=dCdq, dCdv=dCdv, J=J, g=g, dgdq=dgdq,
                    dgdf=dgdf, task=task, dtask=dtask)

    ref = jax.jit(jax.vmap(ref_one))(q, v, a, f, fric, p_ref, R_ref)
    # tolerance floor: the kernel's branch-free polynomial acos
    # (pallas_chain._acos, |err| <= 2e-8 — Mosaic has no acos lowering)
    # amplifies through the log-Jacobian's 1/sin^3 factors to ~1e-6 on
    # the q-Jacobian rows; f32-exact for the runtime path
    for name in out:
        np.testing.assert_allclose(
            np.asarray(out[name]), np.asarray(ref[name]),
            rtol=1e-5, atol=1e-5, err_msg=name)


def test_chain_cost_fold_matches_xla():
    """In-kernel cost quadratization (with_cost) vs the XLA quadratize on
    the flagship gait stack (round-5 perf item): cost, gradients, and the
    dense Wq must match."""
    import jax.numpy as jnp
    from robotoc_tpu.mpc.mpc_trot import MPCTrot
    from robotoc_tpu.costs import base as cost_base

    m = load_robot("anymal")
    mpc = MPCTrot(m, T=0.5, N=10)
    planner = mpc.make_planner()
    planner.set_gait_pattern(np.array([0.15, 0, 0]), 0.0)
    mpc.set_gait_pattern(planner, swing_height=0.1, swing_time=0.25,
                         stance_time=0.0, swing_start_time=0.5)
    q0 = jnp.asarray([0, 0, 0.4792, 0, 0, 0, 1, -0.1, 0.7, -1.0,
                      -0.1, -0.7, 1.0, 0.1, 0.7, -1.0, 0.1, -0.7, 1.0],
                     m.dtype)
    v0 = jnp.zeros(18, m.dtype)
    mpc.planner.init(q0)
    mpc.config_cost = mpc.config_cost.replace(q_ref=q0)
    grid, costs = mpc._build_schedule_and_costs(0.3, q0, v0)
    contacts = mpc.contacts
    assert pch.cost_fold_supported(m, costs, contacts)

    from robotoc_tpu.solver import ocp_solver as OS
    sol = OS.make_initial_solution(m, contacts, mpc.limits, 1e-3, grid,
                                   q0, v0)
    # perturb the state so residuals are nonzero
    key = jax.random.PRNGKey(5)
    dq = 0.2 * jax.random.normal(key, (sol.q.shape[0], m.nv), m.dtype)
    sol = sol.replace(q=jax.vmap(lambda qq, d: rm.integrate(m, qq, d))(
        sol.q, dq),
        v=sol.v + 0.3 * jax.random.normal(jax.random.PRNGKey(6),
                                          sol.v.shape, m.dtype),
        a=0.5 * jax.random.normal(jax.random.PRNGKey(7), sol.a.shape,
                                  m.dtype),
        u=0.5 * jax.random.normal(jax.random.PRNGKey(8), sol.u.shape,
                                  m.dtype))

    rowmask = jax.vmap(contacts.force_mask)(grid.contact_mask[:-1])
    cost_ins = pch.cost_fold_inputs(m, contacts, costs, grid, sol)
    fn = pch.get_chain(m, contacts, with_cost=True)
    out = jax.jit(fn)(sol.q[:-1], sol.v[:-1], sol.a[:-1],
                      sol.f[:-1] * rowmask, grid.friction[:-1],
                      grid.p_ref[:-1], grid.R_ref[:-1], *cost_ins)

    def ref_one(q, v, a, u, f, t, dt):
        quad = cost_base.quadratize_stage(
            costs, m, contacts.max_dimf, q, v, a, u, f, t, dt)
        return quad.cost, quad.lq, quad.lv, quad.la, quad.lu, quad.Qqq

    c_r, lq_r, lv_r, la_r, lu_r, Wq_r = jax.jit(jax.vmap(ref_one))(
        sol.q[:-1], sol.v[:-1], sol.a[:-1], sol.u[:-1], sol.f[:-1],
        grid.t[:-1], grid.dt)
    # tolerance floor: the polynomial acos (see the surface test note)
    # leaves ~1e-6 on the log-derived Gauss-Newton rows
    np.testing.assert_allclose(np.asarray(out["cq_cost"][:, 0]),
                               np.asarray(c_r), rtol=1e-6, atol=1e-8)
    for name, got, want in (("lq", out["cq_lq"], lq_r),
                            ("lv", out["cq_lv"], lv_r),
                            ("la", out["cq_la"], la_r),
                            ("lu", out["cq_lu"], lu_r),
                            ("Wq", out["cq_Wq"], Wq_r)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5, err_msg=name)


def test_chain_state_eq_fold_matches_xla():
    """In-kernel state-equation linearization (se_* outputs) vs
    dynamics/state_equation.linearize on random configs."""
    import jax.numpy as jnp
    from robotoc_tpu.mpc.mpc_trot import MPCTrot
    from robotoc_tpu.dynamics import state_equation as se

    m = load_robot("anymal")
    mpc = MPCTrot(m, T=0.5, N=10)
    planner = mpc.make_planner()
    planner.set_gait_pattern(np.array([0.15, 0, 0]), 0.0)
    mpc.set_gait_pattern(planner, swing_height=0.1, swing_time=0.25,
                         stance_time=0.0, swing_start_time=0.5)
    q0 = jnp.asarray([0, 0, 0.4792, 0, 0, 0, 1, -0.1, 0.7, -1.0,
                      -0.1, -0.7, 1.0, 0.1, 0.7, -1.0, 0.1, -0.7, 1.0],
                     m.dtype)
    v0 = jnp.zeros(18, m.dtype)
    mpc.planner.init(q0)
    mpc.config_cost = mpc.config_cost.replace(q_ref=q0)
    grid, costs = mpc._build_schedule_and_costs(0.3, q0, v0)
    contacts = mpc.contacts
    from robotoc_tpu.solver import ocp_solver as OS
    sol = OS.make_initial_solution(m, contacts, mpc.limits, 1e-3, grid,
                                   q0, v0)
    key = jax.random.PRNGKey(9)
    dq = 0.3 * jax.random.normal(key, (sol.q.shape[0], m.nv), m.dtype)
    sol = sol.replace(
        q=jax.vmap(lambda qq, d: rm.integrate(m, qq, d))(sol.q, dq),
        v=0.4 * jax.random.normal(jax.random.PRNGKey(10), sol.v.shape,
                                  m.dtype))
    rowmask = jax.vmap(contacts.force_mask)(grid.contact_mask[:-1])
    cost_ins = pch.cost_fold_inputs(m, contacts, costs, grid, sol)
    fn = pch.get_chain(m, contacts, with_cost=True)
    out = jax.jit(fn)(sol.q[:-1], sol.v[:-1], sol.a[:-1],
                      sol.f[:-1] * rowmask, grid.friction[:-1],
                      grid.p_ref[:-1], grid.R_ref[:-1], *cost_ins)

    Aqq_r, Aqv_r, xres_r = jax.jit(jax.vmap(
        lambda q, v, dt, qn: se.linearize(m, q, v, dt, qn)))(
        sol.q[:-1], sol.v[:-1], grid.dt, sol.q[1:])
    nv = m.nv
    eye = jnp.eye(nv, dtype=m.dtype)
    Aqq_k = jax.vmap(lambda b: eye.at[:6, :6].set(b))(out["se_Aqq6"])
    Aqv_k = jax.vmap(lambda b, dt: (dt * eye).at[:6, :6].set(dt * b))(
        out["se_J1binv"], grid.dt)
    np.testing.assert_allclose(np.asarray(out["se_xres"]),
                               np.asarray(xres_r), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(Aqq_k), np.asarray(Aqq_r),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(Aqv_k), np.asarray(Aqv_r),
                               rtol=1e-6, atol=1e-7)
