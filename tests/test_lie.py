"""Round-trip and identity tests for the Lie-group ops layer."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robotoc_tpu.ops import lie


def rng_rotvecs(key, n, scale=2.0):
    """Random rotation vectors with norm < pi (principal-log domain)."""
    w = jax.random.normal(key, (n, 3))
    norm = jnp.linalg.norm(w, axis=-1, keepdims=True)
    mag = jax.random.uniform(jax.random.fold_in(key, 1), (n, 1),
                             minval=0.0, maxval=min(scale, 3.1))
    return w / norm * mag


def test_quat_rot_roundtrip():
    key = jax.random.PRNGKey(0)
    w = rng_rotvecs(key, 64)
    q = lie.so3_exp_quat(w)
    R = lie.quat_to_rot(q)
    R2 = lie.so3_exp(w)
    np.testing.assert_allclose(R, R2, atol=1e-12)
    q2 = lie.rot_to_quat(R)
    # quaternion double cover: q and -q are the same rotation
    dot = jnp.abs(jnp.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-12)


def test_so3_exp_log_roundtrip():
    key = jax.random.PRNGKey(1)
    w = rng_rotvecs(key, 64, scale=1.0)
    np.testing.assert_allclose(lie.so3_log(lie.so3_exp(w)), w, atol=1e-10)


def test_so3_small_angle_and_grad():
    w = jnp.array([[0.0, 0.0, 0.0], [1e-9, -1e-9, 1e-9]])
    R = lie.so3_exp(w)
    np.testing.assert_allclose(R[0], jnp.eye(3), atol=1e-15)
    J = jax.jacfwd(lambda x: lie.so3_exp(x).ravel())(jnp.zeros(3))
    assert np.all(np.isfinite(J))
    J2 = jax.jacfwd(lie.so3_log)(jnp.eye(3))
    assert np.all(np.isfinite(J2))


def test_quat_mul_matches_rot_mul():
    key = jax.random.PRNGKey(2)
    w1, w2 = rng_rotvecs(key, 16), rng_rotvecs(jax.random.PRNGKey(3), 16)
    q1, q2 = lie.so3_exp_quat(w1), lie.so3_exp_quat(w2)
    R = lie.quat_to_rot(lie.quat_mul(q1, q2))
    np.testing.assert_allclose(R, lie.quat_to_rot(q1) @ lie.quat_to_rot(q2),
                               atol=1e-12)


def test_se3_exp_log_roundtrip():
    key = jax.random.PRNGKey(4)
    nu = jnp.concatenate(
        [jax.random.normal(key, (64, 3)), rng_rotvecs(key, 64, scale=3.0)],
        axis=-1)
    R, p = lie.se3_exp(nu)
    np.testing.assert_allclose(lie.se3_log(R, p), nu, atol=1e-9)
    # small motions
    nu0 = 1e-10 * jax.random.normal(key, (8, 6))
    R0, p0 = lie.se3_exp(nu0)
    np.testing.assert_allclose(lie.se3_log(R0, p0), nu0, atol=1e-15)


def test_se3_group_action():
    key = jax.random.PRNGKey(5)
    nu1 = jax.random.normal(key, (6,))
    nu2 = jax.random.normal(jax.random.PRNGKey(6), (6,))
    R1, p1 = lie.se3_exp(nu1)
    R2, p2 = lie.se3_exp(nu2)
    Rm, pm = lie.se3_mul(R1, p1, R2, p2)
    Ri, pi = lie.se3_inv(R1, p1)
    Rr, pr = lie.se3_mul(Ri, pi, Rm, pm)
    np.testing.assert_allclose(Rr, R2, atol=1e-12)
    np.testing.assert_allclose(pr, p2, atol=1e-12)


def test_log_exp_adjoint_consistency():
    # d/dt log(exp(t*nu)) = nu at t=1 ... check via finite differences that
    # se3_log is a smooth inverse along the curve.
    nu = jnp.array([0.3, -0.2, 0.5, 0.4, -0.7, 0.2])
    for t in [0.1, 0.5, 1.0]:
        R, p = lie.se3_exp(t * nu)
        np.testing.assert_allclose(lie.se3_log(R, p), t * nu, atol=1e-10)
