"""Contact OCPSolver convergence on the ANYmal standing problem
(reference: test/solver/ocp_solver_test.cpp scenario + examples/anymal)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robotoc_tpu.constraints.joint_limits import make_joint_limits
from robotoc_tpu.costs.config_cost import make_config_cost
from robotoc_tpu.models import forward_kinematics, frame_placement, load_robot
from robotoc_tpu.models.contacts import make_contacts
from robotoc_tpu.planner.contact_sequence import ContactSchedule, discretize
from robotoc_tpu.solver import ocp_solver as OS

FEET = ["LF_FOOT", "LH_FOOT", "RF_FOOT", "RH_FOOT"]
Q_STANDING = jnp.array([0, 0, 0.4792, 0, 0, 0, 1, -0.1, 0.7, -1.0,
                        -0.1, -0.7, 1.0, 0.1, 0.7, -1.0, 0.1, -0.7, 1.0])


@functools.lru_cache(maxsize=1)
def _setup(N=4):
    m = load_robot("anymal")
    contacts = make_contacts(m, FEET, baumgarte_time_step=0.04)
    q_weight = jnp.array([0, 0, 0, 250000, 250000, 250000] + [0.0001] * 12)
    v_weight = jnp.array([100.0] * 6 + [1.0] * 12)
    cost = make_config_cost(m, q_ref=Q_STANDING, q_weight=q_weight,
                            v_weight=v_weight, a_weight=1e-6, u_weight=1e-1,
                            q_weight_terminal=q_weight,
                            v_weight_terminal=v_weight)
    lim = make_joint_limits(m, u_limit=jnp.full(12, 80.0),
                            v_limit=jnp.full(12, 15.0))
    Rw, pw = forward_kinematics(m, Q_STANDING)
    placements = np.stack(
        [np.array(frame_placement(m, m.frame_id(f), Rw, pw)[1])
         for f in FEET])
    sched = ContactSchedule(nc=4).init([True] * 4, placements)
    grid = discretize(sched, 0.0, 0.025 * N, N)
    solver = OS.OCPSolver(m, contacts, (cost,), lim, T=0.025 * N, N=N)
    upd = jax.jit(functools.partial(OS._update, m, contacts, lim,
                                    1e-3, 0.995, False, (cost,)))
    ke = jax.jit(functools.partial(OS._kkt_error, m, contacts, lim,
                                   1e-3, False, (cost,)))
    return m, contacts, solver, grid, upd, ke


def _solve(n_iter=12):
    m, contacts, solver, grid, upd, ke = _setup()
    v0 = jnp.zeros(18)
    sol = solver.init_solution(grid, Q_STANDING, v0)
    for _ in range(n_iter):
        sol, _, _, _ = upd(sol, grid, Q_STANDING, v0)
    return m, sol, float(ke(sol, grid, Q_STANDING, v0))


def test_standing_converges():
    m, sol, kkt = _solve()
    assert kkt < 1e-8
    # weight supported by the four feet
    fz_sum = float(jnp.sum(sol.f[0].reshape(4, 3)[:, 2]))
    assert abs(fz_sum - float(m.total_mass) * 9.81) < 0.1 * 9.81 * float(
        m.total_mass)


def test_friction_cone_satisfied():
    """Cone is imposed on WORLD-frame forces f_W = R_frame @ f_local
    (reference friction_cone.cpp:86-95)."""
    m, sol, _ = _solve()
    contacts = _setup()[1]
    mu = 0.7
    for i in range(sol.q.shape[0] - 1):
        Rw, pw = forward_kinematics(m, sol.q[i])
        for c, foot in enumerate(FEET):
            Rf, _ = frame_placement(m, contacts.frame_ids[c], Rw, pw)
            fW = np.array(Rf @ sol.f[i, 3 * c:3 * c + 3])
            assert fW[2] > 0
            assert abs(fW[0]) <= mu / np.sqrt(2) * fW[2] + 1e-6
            assert abs(fW[1]) <= mu / np.sqrt(2) * fW[2] + 1e-6


def test_dynamics_feasible_at_solution():
    from robotoc_tpu.models import rnea
    from robotoc_tpu.models.contacts import (baumgarte_residual,
                                             contact_forces_to_joint)
    m, sol, _ = _solve()
    contacts = _setup()[1]
    grid = _setup()[3]
    fj = jax.vmap(lambda f: contact_forces_to_joint(m, contacts, f))(
        sol.f[:-1])
    ID = rnea(m, sol.q[:-1], sol.v[:-1], sol.a[:-1], fj)
    # passive rows zero, actuated rows equal u
    np.testing.assert_allclose(ID[:, :6], 0.0, atol=1e-7)
    np.testing.assert_allclose(ID[:, 6:], sol.u[:-1], atol=1e-7)
    # Baumgarte contact constraint satisfied
    C = jax.vmap(lambda q, v, a, p: baumgarte_residual(
        m, contacts, q, v, a, p))(sol.q[:-1], sol.v[:-1], sol.a[:-1],
                                  grid.p_ref[:-1])
    np.testing.assert_allclose(C, 0.0, atol=1e-7)


def test_get_set_solution_by_name():
    """Reference getSolution/setSolution parity
    (ocp_solver.cpp:245-411)."""
    import jax
    import jax.numpy as jnp

    from robotoc_tpu.models import load_robot
    from robotoc_tpu.models.contacts import make_contacts
    from robotoc_tpu.constraints.joint_limits import make_joint_limits
    from robotoc_tpu.costs.config_cost import make_config_cost
    from robotoc_tpu.models import forward_kinematics, frame_placement
    from robotoc_tpu.planner.contact_sequence import (ContactSchedule,
                                                      discretize)
    from robotoc_tpu.solver.ocp_solver import OCPSolver

    m = load_robot("anymal")
    feet = ["LF_FOOT", "LH_FOOT", "RF_FOOT", "RH_FOOT"]
    contacts = make_contacts(m, feet, baumgarte_time_step=0.04)
    q0 = jnp.asarray([0, 0, 0.4792, 0, 0, 0, 1, -0.1, 0.7, -1.0,
                      -0.1, -0.7, 1.0, 0.1, 0.7, -1.0, 0.1, -0.7, 1.0])
    cost = make_config_cost(m, q_ref=q0, q_weight=10.0, v_weight=1.0,
                            a_weight=1e-6, u_weight=1e-2,
                            q_weight_terminal=10.0, v_weight_terminal=1.0)
    lim = make_joint_limits(m, u_limit=jnp.full(12, 80.0),
                            v_limit=jnp.full(12, 15.0))
    Rw, pw = forward_kinematics(m, q0)
    plc = np.stack(
        [np.asarray(frame_placement(m, m.frame_id(f), Rw, pw)[1])
         for f in feet])
    sched = ContactSchedule(nc=4).init([True] * 4, plc)
    N = 6
    grid = discretize(sched, 0.0, 0.025 * N, N)
    solver = OCPSolver(m, contacts, (cost,), lim, T=0.025 * N, N=N)
    sol = solver.init_solution(grid, q0, jnp.zeros(18))

    q_all = solver.get_solution(sol, "q")
    assert q_all.shape == (N + 1, m.nq)
    fw = solver.get_solution(sol, "f_WORLD")
    assert fw.shape == sol.f.shape
    # rotation to world preserves per-contact force norms
    fl3 = np.asarray(sol.f).reshape(N + 1, 4, 3)
    fw3 = np.asarray(fw).reshape(N + 1, 4, 3)
    np.testing.assert_allclose(np.linalg.norm(fw3, axis=-1),
                               np.linalg.norm(fl3, axis=-1), atol=1e-6)
    assert not np.allclose(fw3, fl3)   # frames are not axis-aligned
    # with the grid: swing contacts and impact/terminal slots are zeroed
    # (reference ocp_solver.cpp:280-295)
    grid_sw = grid.replace(contact_mask=grid.contact_mask.at[:, 0].set(0.0))
    fw_m = np.asarray(solver.get_solution(sol, "f_WORLD", grid=grid_sw))
    fw_m3 = fw_m.reshape(N + 1, 4, 3)
    assert np.all(fw_m3[:, 0] == 0.0)          # swing contact zeroed
    assert np.all(fw_m3[-1] == 0.0)            # terminal slot zeroed
    np.testing.assert_allclose(fw_m3[:-1, 1:], fw3[:-1, 1:], atol=1e-6)
    sol2 = solver.set_solution(sol, "v", jnp.ones(18))
    assert np.allclose(np.asarray(sol2.v), 1.0)
    sol3 = solver.set_solution(sol, "q", sol.q)
    assert np.allclose(np.asarray(sol3.q), np.asarray(sol.q))
    import pytest as _pt
    with _pt.raises(ValueError):
        solver.get_solution(sol, "nope")
    with _pt.raises(ValueError):
        solver.set_solution(sol, "u", jnp.zeros(5))


def test_contact_inv_damping():
    """contact_inv_damping regularizes the contact-space Schur inversion
    (reference robot_model_info.hpp:95 + robot.hxx:662-663). Block-level:
    the damped Gauss-Jordan inverse equals the Cholesky oracle with
    the damping added to the Schur diagonal. Solver-level: a tiny damping
    still converges next to the exact solution."""
    from robotoc_tpu.dynamics.contact_dynamics import (mjtj_inverse,
                                                       mjtj_inverse_chol)

    m = load_robot("anymal")
    key = jax.random.PRNGKey(3)
    A = jax.random.normal(key, (18, 18))
    M = A @ A.T + 18 * jnp.eye(18)
    J = jax.random.normal(jax.random.PRNGKey(4), (12, 18))
    delta = 1e-4
    dvec = jnp.full(12, delta)         # all rows active, damped
    for a, b in zip(mjtj_inverse(M, J, dvec),
                    mjtj_inverse_chol(M, J, dvec)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-8)

    # solver level: damped contacts converge on the standing problem
    contacts_d = make_contacts(m, FEET, baumgarte_time_step=0.04,
                               contact_inv_damping=1e-10)
    assert contacts_d.inv_damping == 1e-10
    q_weight = jnp.array([0, 0, 0, 250000, 250000, 250000] + [0.0001] * 12)
    v_weight = jnp.array([100.0] * 6 + [1.0] * 12)
    cost = make_config_cost(m, q_ref=Q_STANDING, q_weight=q_weight,
                            v_weight=v_weight, a_weight=1e-6,
                            u_weight=1e-1, q_weight_terminal=q_weight,
                            v_weight_terminal=v_weight)
    lim = make_joint_limits(m, u_limit=jnp.full(12, 80.0),
                            v_limit=jnp.full(12, 15.0))
    Rw, pw = forward_kinematics(m, Q_STANDING)
    placements = np.stack(
        [np.array(frame_placement(m, m.frame_id(f), Rw, pw)[1])
         for f in FEET])
    sched = ContactSchedule(nc=4).init([True] * 4, placements)
    N = 4
    grid = discretize(sched, 0.0, 0.025 * N, N)
    solver = OS.OCPSolver(m, contacts_d, (cost,), lim, T=0.025 * N, N=N)
    v0 = jnp.zeros(18)
    sol = solver.init_solution(grid, Q_STANDING, v0)
    for _ in range(10):
        sol, kkt, _, _ = solver.update(grid, Q_STANDING, v0, sol)
    assert float(kkt) < 1e-6
