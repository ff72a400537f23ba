"""Cost components vs the finite-difference DerivativeChecker
(reference test/cost/*_test.cpp pattern: DerivativeChecker oracle)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robotoc_tpu.costs.config_cost import make_config_cost
from robotoc_tpu.costs.task_cost import (CoMCost, ConstantRef, SE3Ref,
                                         LocalContactForceCost,
                                         TaskSpace3DCost, TaskSpace6DCost)
from robotoc_tpu.models import load_robot
from robotoc_tpu.models import robot as rm
from robotoc_tpu.utils.derivative_checker import DerivativeChecker


@pytest.fixture(scope="module")
def anymal():
    return load_robot("anymal")


def _rand_state(m, seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 5)
    q = rm.random_configuration(m, ks[0])
    v = 0.3 * jax.random.normal(ks[1], (m.nv,))
    a = 0.3 * jax.random.normal(ks[2], (m.nv,))
    u = 0.3 * jax.random.normal(ks[3], (m.dimu,))
    f = jax.random.normal(ks[4], (12,))
    return q, v, a, u, f


def test_config_cost_derivatives(anymal):
    m = anymal
    q, v, a, u, f = _rand_state(m)
    cost = make_config_cost(
        m, q_ref=rm.neutral(m), q_weight=2.0, v_weight=1.0, a_weight=0.5,
        u_weight=0.1, q_weight_terminal=3.0, v_weight_terminal=1.0,
        q_weight_impact=1.0, v_weight_impact=1.0, dv_weight_impact=0.5)
    chk = DerivativeChecker(m)
    assert chk.check_first_order_stage(cost, 12, q, v, a, u, f, 0.3, 0.02)
    assert chk.check_first_order_terminal(cost, q, v, 0.5)
    assert chk.check_first_order_impact(cost, q, v, a, 0.4)
    # second order (the reference's check_second_order_* family): the
    # Gauss-Newton Qqq freezes the Lie-difference Jacobian, so it is the
    # exact Hessian only at qdiff == 0 — evaluate there (cost referenced
    # at the evaluation point); Qvv/Qaa/Quu are exact everywhere
    cost_at_q = cost.replace(q_ref=q)
    chk2 = DerivativeChecker(m, eps=1e-5, rtol=5e-3, atol=1e-4)
    assert chk2.check_second_order_stage(cost_at_q, 12, q, v, a, u, f,
                                         0.3, 0.02)
    assert chk2.check_second_order_terminal(cost_at_q, q, v, 0.5)


def test_task3d_cost_derivatives(anymal):
    m = anymal
    q, v, a, u, f = _rand_state(m, 1)
    ref = ConstantRef(p=jnp.asarray([0.3, 0.1, 0.0]))
    cost = TaskSpace3DCost(frame_id=m.frame_id("LF_FOOT"),
                           weight=jnp.full(3, 2.0),
                           weight_terminal=jnp.full(3, 1.0),
                           weight_impact=jnp.full(3, 1.5), ref=ref)
    chk = DerivativeChecker(m)
    assert chk.check_first_order_stage(cost, 12, q, v, a, u, f, 0.3, 0.02)
    assert chk.check_first_order_terminal(cost, q, v, 0.5)


def test_task6d_cost_derivatives(anymal):
    m = anymal
    q, v, a, u, f = _rand_state(m, 2)
    ref = SE3Ref(R=jnp.eye(3), p=jnp.asarray([0.3, 0.1, 0.0]))
    cost = TaskSpace6DCost(frame_id=m.frame_id("LF_FOOT"),
                           weight=jnp.full(6, 2.0),
                           weight_terminal=jnp.full(6, 1.0),
                           weight_impact=jnp.full(6, 1.5), ref=ref)
    chk = DerivativeChecker(m)
    assert chk.check_first_order_stage(cost, 12, q, v, a, u, f, 0.3, 0.02)
    assert chk.check_first_order_terminal(cost, q, v, 0.5)


def test_com_cost_derivatives(anymal):
    m = anymal
    q, v, a, u, f = _rand_state(m, 3)
    cost = CoMCost(weight=jnp.full(3, 2.0),
                   weight_terminal=jnp.full(3, 1.0),
                   weight_impact=jnp.full(3, 1.0),
                   ref=ConstantRef(p=jnp.asarray([0.0, 0.0, 0.4])))
    chk = DerivativeChecker(m)
    assert chk.check_first_order_stage(cost, 12, q, v, a, u, f, 0.3, 0.02)


def test_contact_force_cost_derivatives(anymal):
    m = anymal
    q, v, a, u, f = _rand_state(m, 4)
    cost = LocalContactForceCost(f_weight=jnp.full(12, 0.7),
                                 f_ref=jnp.zeros(12).at[2::3].set(80.0))
    chk = DerivativeChecker(m)
    assert chk.check_first_order_stage(cost, 12, q, v, a, u, f, 0.3, 0.02)


def test_rotation_utils():
    from robotoc_tpu.utils import rotation as rot
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (4,))
    q = q / jnp.linalg.norm(q)
    R = rot.rotation_matrix_from_quaternion(q)
    assert np.allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-12)
    q2 = rot.quaternion_from_rotation_matrix(R)
    R2 = rot.rotation_matrix_from_quaternion(q2)
    assert np.allclose(np.asarray(R2), np.asarray(R), atol=1e-9)
    n = jnp.asarray([0.1, 0.2, 0.97])
    Rn = rot.rotation_matrix_from_normal_vector(n)
    assert np.allclose(np.asarray(Rn[:, 2]),
                       np.asarray(n / jnp.linalg.norm(n)), atol=1e-12)
    Rz = rot.project_rotation_matrix_z(R)
    assert np.allclose(np.asarray(Rz @ Rz.T), np.eye(3), atol=1e-12)
    assert float(Rz[2, 2]) == pytest.approx(1.0)


def test_base_rotation_cost_derivatives(anymal):
    """BaseRotationCost (time-varying quaternion ref) vs FD — the gait
    MPC's base-rot component (reference mpc_trot.cpp:55-60 +
    mpc_periodic_configuration_ref.cpp)."""
    from robotoc_tpu.costs.task_cost import BaseRotationCost
    from robotoc_tpu.mpc.refs import StepBaseRotRef
    from robotoc_tpu.ops import lie

    m = anymal
    q, v, a, u, f = _rand_state(m, seed=3)
    yaw = 0.3
    quats = jnp.stack([
        jnp.asarray([0.0, 0.0, 0.0, 1.0]),
        jnp.asarray([0.0, 0.0, np.sin(yaw / 2), np.cos(yaw / 2)]),
        jnp.asarray([0.0, 0.0, np.sin(yaw), np.cos(yaw)]),
    ])
    ref = StepBaseRotRef(quat_steps=quats,
                         t_start=jnp.asarray([0.1, 0.5]),
                         swing_time=jnp.asarray(0.25),
                         valid=jnp.ones(2))
    cost = BaseRotationCost(weight=jnp.full(3, 2.0),
                            weight_terminal=jnp.full(3, 3.0),
                            weight_impact=jnp.full(3, 1.0), ref=ref)
    chk = DerivativeChecker(m)
    for t in (0.05, 0.2, 0.45, 0.6):
        assert chk.check_first_order_stage(cost, 12, q, v, a, u, f, t, 0.02)
        assert chk.check_first_order_terminal(cost, q, v, t)
        assert chk.check_first_order_impact(cost, q, v, a, t)
    # slerp endpoints: before the first step the ref is quat_steps[0]
    qr, act = ref(0.0)
    np.testing.assert_allclose(np.asarray(qr), np.asarray(quats[0]),
                               atol=1e-12)
    # mid-swing of step 0: halfway between quats[0] (0) and quats[1] (yaw)
    qr, _ = ref(0.1 + 0.125)
    Rh = lie.quat_to_rot(qr)
    ang = np.asarray(lie.so3_log(Rh))
    np.testing.assert_allclose(ang[2], yaw / 2, atol=1e-9)


def test_time_varying_config_ref_derivatives(anymal):
    """ConfigurationSpaceCost with a time-varying q_ref_fn (the reference
    ConfigurationSpaceRefBase path, configuration_space_ref_base.hpp:16 +
    mpc_periodic_configuration_ref.cpp): FD-check the quadratization and
    pin the t-dependence of the reference."""
    from robotoc_tpu.mpc.refs import StepConfigurationRef

    m = anymal
    q, v, a, u, f = _rand_state(m, 7)
    q0 = rm.neutral(m)
    yaw0, yaw1 = 0.0, 0.6
    quat_steps = jnp.asarray(
        [[0.0, 0.0, np.sin(0.5 * y), np.cos(0.5 * y)]
         for y in (yaw0, yaw1, yaw1)])
    ref = StepConfigurationRef(
        q=q0, quat_steps=quat_steps,
        t_start=jnp.asarray([0.2, 1e9]), swing_time=jnp.asarray(0.4),
        valid=jnp.asarray([1.0, 0.0]))
    # t-dependence: before the swing the ref is q0; at mid-swing the base
    # quaternion has slerped halfway to yaw1
    r_before = np.asarray(ref(0.0))
    np.testing.assert_allclose(r_before, np.asarray(q0), atol=1e-12)
    r_mid = np.asarray(ref(0.4))
    expect_yaw = 0.5 * (yaw0 + yaw1)
    np.testing.assert_allclose(
        r_mid[3:7],
        [0.0, 0.0, np.sin(0.5 * expect_yaw), np.cos(0.5 * expect_yaw)],
        atol=1e-9)
    np.testing.assert_allclose(r_mid[7:], np.asarray(q0)[7:], atol=1e-12)

    cost = make_config_cost(
        m, q_ref_fn=ref, q_weight=2.0, v_weight=1.0, a_weight=0.5,
        u_weight=0.1, q_weight_terminal=3.0, v_weight_terminal=1.0,
        q_weight_impact=1.0, v_weight_impact=1.0, dv_weight_impact=0.5)
    chk = DerivativeChecker(m)
    assert chk.check_first_order_stage(cost, 12, q, v, a, u, f, 0.4, 0.02)
    assert chk.check_first_order_terminal(cost, q, v, 0.4)
    assert chk.check_first_order_impact(cost, q, v, a, 0.4)
