"""Robot model validation: cross-algorithm + finite-difference oracles.

Mirrors the reference's test strategy (test/robot/robot_test.cpp — dims,
limits, kinematics vs Pinocchio ground truth) with self-contained oracles:
RNEA vs CRBA decomposition, autodiff derivatives vs finite differences, and
Lie-group roundtrips.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robotoc_tpu.models import (com, crba, difference, forward_kinematics,
                                frame_placement, frame_velocity, integrate,
                                load_robot, neutral, nonlinear_effects,
                                random_configuration, rnea, rnea_derivatives,
                                rnea_impact, rnea_impact_derivatives)
from robotoc_tpu.models import robot as rm


@pytest.fixture(scope="module", params=["iiwa14", "anymal"])
def model(request):
    return load_robot(request.param)


def _rand_qva(model, seed=0):
    key = jax.random.PRNGKey(seed)
    q = random_configuration(model, key)
    v = jax.random.normal(jax.random.PRNGKey(seed + 1), (model.nv,))
    a = jax.random.normal(jax.random.PRNGKey(seed + 2), (model.nv,))
    return q, v, a


def test_dims():
    iiwa = load_robot("iiwa14")
    assert (iiwa.nq, iiwa.nv, iiwa.dimu, iiwa.dim_passive) == (7, 7, 7, 0)
    anymal = load_robot("anymal")
    assert (anymal.nq, anymal.nv, anymal.dimu, anymal.dim_passive) == \
        (19, 18, 12, 6)
    for foot in ["LF_FOOT", "RF_FOOT", "LH_FOOT", "RH_FOOT"]:
        assert foot in anymal.frame_names


def test_rnea_equals_crba_decomposition(model):
    q, v, a = _rand_qva(model)
    tau = rnea(model, q, v, a)
    M = crba(model, q)
    h = nonlinear_effects(model, q, v)
    np.testing.assert_allclose(tau, M @ a + h, atol=1e-10)
    np.testing.assert_allclose(M, M.T, atol=1e-12)
    assert np.linalg.eigvalsh(np.asarray(M)).min() > 0


def test_rnea_derivatives_vs_fd(model):
    q, v, a = _rand_qva(model, seed=10)
    dtq, dtv, dta = rnea_derivatives(model, q, v, a)
    np.testing.assert_allclose(dta, crba(model, q), atol=1e-10)
    eps = 1e-6
    nv = model.nv
    fdq, fdv = np.zeros((nv, nv)), np.zeros((nv, nv))
    for k in range(nv):
        e = np.zeros(nv)
        e[k] = eps
        e = jnp.asarray(e)
        fdq[:, k] = (rnea(model, integrate(model, q, e), v, a)
                     - rnea(model, integrate(model, q, -e), v, a)) / (2 * eps)
        fdv[:, k] = (rnea(model, q, v + e, a)
                     - rnea(model, q, v - e, a)) / (2 * eps)
    np.testing.assert_allclose(dtq, fdq, atol=5e-6)
    np.testing.assert_allclose(dtv, fdv, atol=5e-6)


def test_impact_dynamics(model):
    q, dv, _ = _rand_qva(model, seed=20)
    res = rnea_impact(model, q, dv)
    M = crba(model, q)
    np.testing.assert_allclose(res, M @ dv, atol=1e-10)
    dq, ddv = rnea_impact_derivatives(model, q, dv)
    np.testing.assert_allclose(ddv, M, atol=1e-10)


def test_integrate_difference_roundtrip(model):
    q, v, _ = _rand_qva(model, seed=30)
    dq = 0.3 * v
    q2 = integrate(model, q, dq)
    np.testing.assert_allclose(difference(model, q, q2), dq, atol=1e-12)
    np.testing.assert_allclose(difference(model, q, q), 0.0, atol=1e-12)


def test_d_difference_vs_fd():
    model = load_robot("anymal")
    q0 = random_configuration(model, jax.random.PRNGKey(0))
    q1 = integrate(model, q0,
                   0.2 * jax.random.normal(jax.random.PRNGKey(1), (model.nv,)))
    J0 = rm.d_difference_dq0(model, q0, q1)
    J1 = rm.d_difference_dq1(model, q0, q1)
    eps = 1e-6
    nv = model.nv
    fd0, fd1 = np.zeros((nv, nv)), np.zeros((nv, nv))
    for k in range(nv):
        e = np.zeros(nv)
        e[k] = eps
        e = jnp.asarray(e)
        fd0[:, k] = (difference(model, integrate(model, q0, e), q1)
                     - difference(model, integrate(model, q0, -e), q1)) / (2 * eps)
        fd1[:, k] = (difference(model, q0, integrate(model, q1, e))
                     - difference(model, q0, integrate(model, q1, -e))) / (2 * eps)
    np.testing.assert_allclose(J0, fd0, atol=5e-7)
    np.testing.assert_allclose(J1, fd1, atol=5e-7)


def test_static_base_wrench_is_weight():
    model = load_robot("anymal")
    tau = rnea(model, neutral(model), jnp.zeros(model.nv),
               jnp.zeros(model.nv))
    weight = float(model.total_mass) * 9.81
    np.testing.assert_allclose(tau[:3], [0.0, 0.0, weight], atol=1e-9)


def test_frame_velocity_vs_fd():
    model = load_robot("anymal")
    q, v, _ = _rand_qva(model, seed=40)
    fid = model.frame_id("LF_FOOT")
    vf = frame_velocity(model, fid, q, v)
    eps = 1e-7

    def pos(t):
        qt = integrate(model, q, t * v)
        R_w, p_w = forward_kinematics(model, qt)
        return frame_placement(model, fid, R_w, p_w)

    Rp, pp = pos(eps)
    Rm, pm = pos(-eps)
    pdot_world = (pp - pm) / (2 * eps)
    R0, _ = pos(0.0)
    # local linear velocity = R^T * world velocity of the frame origin
    np.testing.assert_allclose(vf[:3], R0.T @ pdot_world, atol=1e-6)
    # local angular velocity: Rdot = R * hat(w_local)
    What = R0.T @ ((Rp - Rm) / (2 * eps))
    w_local = jnp.array([What[2, 1], What[0, 2], What[1, 0]])
    np.testing.assert_allclose(vf[3:], w_local, atol=1e-6)


def test_com_against_definition():
    model = load_robot("anymal")
    q = random_configuration(model, jax.random.PRNGKey(7))
    c = com(model, q)
    assert c.shape == (3,)
    # CoM of the neutral config is near the base origin (symmetric robot)
    c0 = com(model, neutral(model))
    assert abs(float(c0[1])) < 0.05


def test_batched_consistency(model):
    qs, vs, as_ = zip(*[_rand_qva(model, seed=100 + i) for i in range(4)])
    qb, vb, ab = jnp.stack(qs), jnp.stack(vs), jnp.stack(as_)
    tau_b = rnea(model, qb, vb, ab)       # broadcast path
    tau_v = jax.vmap(lambda q, v, a: rnea(model, q, v, a))(qb, vb, ab)
    for i in range(4):
        ref = rnea(model, qs[i], vs[i], as_[i])
        np.testing.assert_allclose(tau_b[i], ref, atol=1e-12)
        np.testing.assert_allclose(tau_v[i], ref, atol=1e-12)


def test_robot_properties_momentum_bias():
    """RobotProperties: runtime-settable generalized-momentum bias
    subtracted from the RNEA torque (reference robot_properties.hpp:36 +
    robot.hxx:540-542 + Robot::setRobotProperties robot.cpp:469-476).
    Not applied to the impact (gravity-free) RNEA, like the reference."""
    from robotoc_tpu.models import (load_robot, rnea, rnea_impact,
                                    set_robot_properties)
    from robotoc_tpu.models import robot as rm

    m = load_robot("anymal")
    key = jax.random.PRNGKey(11)
    q = rm.random_configuration(m, key)
    v = 0.2 * jax.random.normal(jax.random.PRNGKey(12), (m.nv,))
    a = 0.2 * jax.random.normal(jax.random.PRNGKey(13), (m.nv,))
    bias = 0.5 * jax.random.normal(jax.random.PRNGKey(14), (m.nv,))
    tau0 = rnea(m, q, v, a)
    m_b = set_robot_properties(m, generalized_momentum_bias=bias)
    tau_b = rnea(m_b, q, v, a)
    np.testing.assert_allclose(np.asarray(tau_b),
                               np.asarray(tau0 - bias), atol=1e-12)
    # impact RNEA unaffected
    np.testing.assert_allclose(np.asarray(rnea_impact(m_b, q, a)),
                               np.asarray(rnea_impact(m, q, a)),
                               atol=1e-12)
    # zero bias clears the property
    m_z = set_robot_properties(m_b, generalized_momentum_bias=np.zeros(
        m.nv))
    assert m_z.generalized_momentum_bias is None
    with pytest.raises(ValueError):
        set_robot_properties(m, generalized_momentum_bias=np.ones(3))
