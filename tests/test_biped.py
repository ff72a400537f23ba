"""Surface contacts + wrench cones + biped walk MPC (iCub lower half).

Mirrors the reference's iCub pipeline (reference examples/icub/mpc/walk.py,
src/constraints/contact_wrench_cone.cpp, robot/surface_contact.hxx).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robotoc_tpu.constraints import friction_cone as fc
from robotoc_tpu.models import contacts as ct
from robotoc_tpu.models import (forward_kinematics, frame_placement,
                                load_robot)
from robotoc_tpu.models import robot as rm

KNEE = np.pi / 6


@pytest.fixture(scope="module")
def setup():
    m = load_robot("icub_lower_half")
    contacts = ct.make_contacts(m, ["l_sole", "r_sole"],
                                types=(ct.SURFACE, ct.SURFACE),
                                baumgarte_time_step=0.05,
                                rect=(0.1, 0.05))
    q0 = np.array([0, 0, 0, 0, 0, 0, 1,
                   0.5 * KNEE, 0, 0, -KNEE, 0.5 * KNEE, 0,
                   0.5 * KNEE, 0, 0, -KNEE, 0.5 * KNEE, 0])
    Rw, pw = forward_kinematics(m, jnp.asarray(q0))
    zs = [np.asarray(frame_placement(m, m.frame_id(f), Rw, pw)[1])[2]
          for f in ["l_sole", "r_sole"]]
    q0[2] = -0.5 * (zs[0] + zs[1])
    return m, contacts, jnp.asarray(q0)


def _placements(m, contacts, q):
    Rw, pw = forward_kinematics(m, q)
    Rs, ps = [], []
    for fid in contacts.frame_ids:
        R, p = frame_placement(m, fid, Rw, pw)
        Rs.append(np.asarray(R))
        ps.append(np.asarray(p))
    return np.stack(ps), np.stack(Rs)


def test_dims(setup):
    m, contacts, q0 = setup
    assert contacts.max_dimf == 12
    assert contacts.cone_dims == (17, 17)
    assert contacts.dimc_cone == 34
    assert np.allclose(np.asarray(contacts.force_mask(
        jnp.asarray([1.0, 0.0]))), [1] * 6 + [0] * 6)


def test_surface_baumgarte_zero_at_rest(setup):
    m, contacts, q0 = setup
    p_ref, R_ref = _placements(m, contacts, q0)
    v = jnp.zeros(m.nv)
    r = ct.baumgarte_residual(m, contacts, q0, v, v,
                              jnp.asarray(p_ref), jnp.asarray(R_ref))
    assert r.shape == (12,)
    assert np.allclose(np.asarray(r), 0.0, atol=1e-9)


def test_surface_baumgarte_position_gain(setup):
    m, contacts, q0 = setup
    p_ref, R_ref = _placements(m, contacts, q0)
    p_shift = p_ref + np.array([0.01, 0, 0])
    v = jnp.zeros(m.nv)
    r = ct.baumgarte_residual(m, contacts, q0, v, v,
                              jnp.asarray(p_shift), jnp.asarray(R_ref))
    # pure translation error, expressed in the CONTACT frame:
    # err6 = [R_ref^T (p - p_ref_shifted), 0]
    kp = float(contacts.kp[0])
    r = np.asarray(r).reshape(2, 6)
    for c in range(2):
        expect = kp * (R_ref[c].T @ (p_ref[c] - p_shift[c]))
        assert np.allclose(r[c, :3], expect, rtol=1e-6)
        assert np.allclose(r[c, 3:], 0.0, atol=1e-9)


def test_wrench_cone_feasibility(setup):
    m, contacts, q0 = setup
    # wrench well inside the cone: pure normal force
    f = jnp.zeros(12).at[2].set(100.0).at[8].set(100.0)
    g, dgdf, dgdq = fc.residual_and_jac(m, contacts, q0, f,
                                        jnp.asarray([0.7, 0.7]))
    assert g.shape == (34,) and dgdf.shape == (34, 12) \
        and dgdq.shape == (34, m.nv)
    assert np.all(np.asarray(g) < 0)
    # surface cone has no q-dependence (local wrench)
    assert np.allclose(np.asarray(dgdq), 0.0)
    # CoP outside the foot box -> infeasible: large pitch torque
    f_bad = f.at[4].set(100.0 * 0.2)      # tau_y = 20 > X * fz = 10
    g2, _, _ = fc.residual_and_jac(m, contacts, q0, f_bad,
                                   jnp.asarray([0.7, 0.7]))
    assert np.max(np.asarray(g2)) > 0


def test_biped_standing_ocp_converges(setup):
    """Surface-contact OCPSolver drives KKT down on iCub standing
    (reference test/solver/ocp_solver_test.cpp pattern, humanoid)."""
    import functools

    from robotoc_tpu.constraints.joint_limits import make_joint_limits
    from robotoc_tpu.costs.config_cost import make_config_cost
    from robotoc_tpu.planner.contact_sequence import (ContactSchedule,
                                                      discretize)
    from robotoc_tpu.solver import ocp_solver as OS

    m, contacts, q0 = setup
    p_ref, R_ref = _placements(m, contacts, q0)
    qw = jnp.asarray([0, 0, 0, 1000, 1000, 1000] + [0.001] * (m.nv - 6))
    cost = make_config_cost(m, q_ref=q0, q_weight=qw,
                            v_weight=jnp.full(m.nv, 1.0), a_weight=1e-6,
                            u_weight=1e-2, q_weight_terminal=qw,
                            v_weight_terminal=jnp.full(m.nv, 1.0))
    lim = make_joint_limits(m, u_limit=jnp.full(m.dimu, 60.0),
                            v_limit=jnp.full(m.dimu, 10.0))
    sched = ContactSchedule(nc=2).init([True, True], p_ref,
                                       rotations=R_ref)
    N = 4
    grid = discretize(sched, 0.0, 0.025 * N, N)
    sol = OS.make_initial_solution(m, contacts, lim, 1e-3, grid, q0,
                                   jnp.zeros(m.nv))
    upd = jax.jit(functools.partial(OS._update, m, contacts, lim, 1e-3,
                                    0.995, False, (cost,)))
    ke = jax.jit(functools.partial(OS._kkt_error, m, contacts, lim, 1e-3,
                                   False, (cost,)))
    v0 = jnp.zeros(m.nv)
    kkt0 = float(ke(sol, grid, q0, v0))
    for _ in range(12):
        sol, kkt, alpha, _ = upd(sol, grid, q0, v0)
    kkt_end = float(ke(sol, grid, q0, v0))
    assert np.isfinite(kkt_end)
    assert kkt_end < 1e-6
    # weight supported: WORLD-frame vertical force sums to m g (local
    # wrenches rotate through the sole frame orientation)
    f = np.asarray(sol.f)
    fz_world = np.stack([
        (R_ref[0] @ f[k, 0:3])[2] + (R_ref[1] @ f[k, 6:9])[2]
        for k in range(N)])
    mg = float(m.total_mass) * 9.81
    assert np.allclose(fz_world, mg, rtol=0.05)
