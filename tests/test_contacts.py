"""Contact model tests: Baumgarte residual structure + force mapping."""
import jax
import jax.numpy as jnp
import numpy as np

from robotoc_tpu.models import (crba, integrate, load_robot,
                                random_configuration, rnea)
from robotoc_tpu.models import contacts as ct
from robotoc_tpu.models import robot as rm

FEET = ["LF_FOOT", "RF_FOOT", "LH_FOOT", "RH_FOOT"]


def _setup(seed=0):
    model = load_robot("anymal")
    contacts = ct.make_contacts(model, FEET)
    q = random_configuration(model, jax.random.PRNGKey(seed))
    v = jax.random.normal(jax.random.PRNGKey(seed + 1), (model.nv,))
    a = jax.random.normal(jax.random.PRNGKey(seed + 2), (model.nv,))
    return model, contacts, q, v, a


def test_baumgarte_residual_at_tracking():
    """If the frame is exactly at p_ref with zero velocity/accel along the
    chain... easier: residual with Kp=Kv=0 equals local classical accel and
    the da-derivative equals the local linear frame Jacobian."""
    model, contacts, q, v, a = _setup()
    R_w, p_w = rm.forward_kinematics(model, q)
    p_ref = jnp.stack([rm.frame_placement(model, fid, R_w, p_w)[1]
                       for fid in contacts.frame_ids])
    r = ct.baumgarte_residual(model, contacts, q, v, a, p_ref)
    assert r.shape == (12,)
    # position term vanishes at p_ref: residual must equal accel+vel terms
    r2 = ct.baumgarte_residual(model, contacts, q, v, a, p_ref + 1.0)
    np.testing.assert_allclose(r2 - r, -contacts.kp[0], atol=1e-10)


def test_baumgarte_da_is_contact_jacobian():
    """dB/da must equal the local linear frame Jacobian J, and the ID force
    map must be -J^T (the condensing identity the reference exploits,
    src/dynamics/contact_dynamics.cpp:55)."""
    model, contacts, q, v, a = _setup(seed=5)
    p_ref = jnp.zeros((4, 3))
    _, _, da = ct.baumgarte_derivatives(model, contacts, q, v, a, p_ref)
    # J^T f must equal the generalized force of applying f at the frames:
    f_stack = jax.random.normal(jax.random.PRNGKey(9), (12,))
    f_joint = ct.contact_forces_to_joint(model, contacts, f_stack)
    tau_with = rnea(model, q, v, a, f_joint)
    tau_without = rnea(model, q, v, a)
    np.testing.assert_allclose(tau_without - tau_with, da.T @ f_stack,
                               atol=1e-9)


def test_baumgarte_derivatives_vs_fd():
    model, contacts, q, v, a = _setup(seed=11)
    p_ref = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (4, 3))
    dq, dv, da = ct.baumgarte_derivatives(model, contacts, q, v, a, p_ref)
    eps = 1e-6
    nv = model.nv
    fd = np.zeros((12, nv))
    for k in range(nv):
        e = np.zeros(nv)
        e[k] = eps
        e = jnp.asarray(e)
        rp = ct.baumgarte_residual(model, contacts,
                                   integrate(model, q, e), v, a, p_ref)
        rm_ = ct.baumgarte_residual(model, contacts,
                                    integrate(model, q, -e), v, a, p_ref)
        fd[:, k] = (rp - rm_) / (2 * eps)
    np.testing.assert_allclose(dq, fd, atol=5e-5)


def test_impact_velocity_residual():
    model, contacts, q, v, _ = _setup(seed=21)
    r = ct.impact_velocity_residual(model, contacts, q, v)
    assert r.shape == (12,)
    dq, dv = ct.impact_velocity_derivatives(model, contacts, q, v)
    # linear in v: r = dv @ v
    np.testing.assert_allclose(r, dv @ v, atol=1e-10)


def test_contact_position_residual():
    model, contacts, q, _, _ = _setup(seed=31)
    R_w, p_w = rm.forward_kinematics(model, q)
    p_ref = jnp.stack([rm.frame_placement(model, fid, R_w, p_w)[1]
                       for fid in contacts.frame_ids])
    r = ct.contact_position_residual(model, contacts, q, p_ref)
    np.testing.assert_allclose(r, 0.0, atol=1e-12)
    J = ct.contact_position_derivative(model, contacts, q, p_ref)
    assert J.shape == (12, model.nv)
    assert float(jnp.abs(J).max()) > 0.1
