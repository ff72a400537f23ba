"""Batched Lie-group operations on SO(3)/SE(3) for floating-base configs.

TPU-native re-design of the configuration-space ops the reference delegates to
Pinocchio (reference: include/robotoc/robot/robot.hpp:80-207 —
integrateConfiguration / subtractConfiguration / dSubtractConfiguration /
dIntegrateTransport / interpolateConfiguration).

Conventions (matching Pinocchio so the reference's semantics carry over):
  * quaternions are stored (x, y, z, w), unit norm;
  * an SE(3) placement is the pair (R, p): x_world = R @ x_local + p;
  * a tangent (motion) vector is ordered (linear, angular), expressed in the
    LOCAL frame;
  * integration is on the right: M' = M * exp6(v * dt).

All functions broadcast over arbitrary leading batch dimensions; the last
dimension(s) carry the geometric object. No data-dependent control flow —
small-angle handling uses Taylor-series `where` switches so every op is
jit/vmap/grad-safe (including at the identity).
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS2 = 1e-14  # squared-angle switch point for Taylor fallbacks


def _safe_sqrt(x):
    """sqrt with a non-NaN gradient at 0 (used only under `where` guards)."""
    return jnp.sqrt(jnp.where(x > _EPS2, x, 1.0))


def _sin_t_over_t(t2, t):
    """sin(t)/t with Taylor fallback, given t2 = t**2."""
    return jnp.where(t2 > _EPS2, jnp.sin(t) / jnp.where(t2 > _EPS2, t, 1.0),
                     1.0 - t2 / 6.0 + t2 * t2 / 120.0)


def _one_minus_cos_over_t2(t2, t):
    return jnp.where(t2 > _EPS2,
                     (1.0 - jnp.cos(t)) / jnp.where(t2 > _EPS2, t2, 1.0),
                     0.5 - t2 / 24.0 + t2 * t2 / 720.0)


def _t_minus_sin_over_t3(t2, t):
    t3 = t2 * t
    return jnp.where(t2 > _EPS2,
                     (t - jnp.sin(t)) / jnp.where(t2 > _EPS2, t3, 1.0),
                     1.0 / 6.0 - t2 / 120.0 + t2 * t2 / 5040.0)


def hat(w):
    """Skew-symmetric matrix of omega, batched: (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([z, -wz, wy], axis=-1),
        jnp.stack([wz, z, -wx], axis=-1),
        jnp.stack([-wy, wx, z], axis=-1),
    ], axis=-2)


# ---------------------------------------------------------------------------
# Quaternions (x, y, z, w)
# ---------------------------------------------------------------------------

def quat_mul(a, b):
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    ], axis=-1)


def quat_conj(q):
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_rot(q):
    """(..., 4) unit quaternion -> (..., 3, 3) rotation matrix."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack([
        jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
        jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
        jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
    ], axis=-2)


def rot_to_quat(R):
    """(..., 3, 3) -> (..., 4) via the branchless 4-candidate method."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # Four candidate 4*|component|^2 values.
    qw2 = 1.0 + tr
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22
    # Candidate quaternions from each pivot (unnormalized).
    def cand_w():
        s = _safe_sqrt(qw2) * 2.0
        return jnp.stack([(m21 - m12) / s, (m02 - m20) / s,
                          (m10 - m01) / s, 0.25 * s], axis=-1)
    def cand_x():
        s = _safe_sqrt(qx2) * 2.0
        return jnp.stack([0.25 * s, (m01 + m10) / s,
                          (m02 + m20) / s, (m21 - m12) / s], axis=-1)
    def cand_y():
        s = _safe_sqrt(qy2) * 2.0
        return jnp.stack([(m01 + m10) / s, 0.25 * s,
                          (m12 + m21) / s, (m02 - m20) / s], axis=-1)
    def cand_z():
        s = _safe_sqrt(qz2) * 2.0
        return jnp.stack([(m02 + m20) / s, (m12 + m21) / s,
                          0.25 * s, (m10 - m01) / s], axis=-1)
    cands = jnp.stack([cand_w(), cand_x(), cand_y(), cand_z()], axis=-2)
    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    idx = jnp.argmax(mags, axis=-1)
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, -1),
                            axis=-2)[..., 0, :]
    return quat_normalize(q)


def so3_exp_quat(w):
    """Rotation-vector (..., 3) -> unit quaternion."""
    t2 = jnp.sum(w * w, axis=-1, keepdims=True)
    t = _safe_sqrt(t2[..., 0])[..., None]
    half = 0.5 * t
    # sin(t/2)/t and cos(t/2), both Taylor-guarded (t from _safe_sqrt is
    # garbage in the small branch and must not leak through).
    s = 0.5 * _sin_t_over_t(0.25 * t2, half)
    c = jnp.where(t2 > _EPS2, jnp.cos(half),
                  1.0 - t2 / 8.0 + t2 * t2 / 384.0)
    return jnp.concatenate([w * s, c], axis=-1)


def quat_log(q):
    """Unit quaternion -> rotation vector (..., 3). Takes the short arc."""
    # Flip to positive hemisphere for a principal log.
    sign = jnp.where(q[..., 3:4] < 0, -1.0, 1.0)
    q = q * sign
    vn2 = jnp.sum(q[..., :3] ** 2, axis=-1)
    vn = _safe_sqrt(vn2)
    w = jnp.clip(q[..., 3], -1.0, 1.0)
    angle = 2.0 * jnp.arctan2(vn, w)
    scale = jnp.where(vn2 > _EPS2, angle / vn, 2.0 / jnp.clip(w, 1e-12))
    return q[..., :3] * scale[..., None]


# ---------------------------------------------------------------------------
# SO(3) matrix exp/log
# ---------------------------------------------------------------------------

def so3_exp(w):
    """Rotation vector -> rotation matrix (Rodrigues, Taylor-safe)."""
    t2 = jnp.sum(w * w, axis=-1)
    t = _safe_sqrt(t2)
    A = _sin_t_over_t(t2, t)[..., None, None]
    B = _one_minus_cos_over_t2(t2, t)[..., None, None]
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A * W + B * (W @ W)


def so3_log(R):
    return quat_log(rot_to_quat(R))


def so3_left_jacobian(w):
    """J_l(w): exp(w + dw) ≈ exp(J_l dw) exp(w)."""
    t2 = jnp.sum(w * w, axis=-1)
    t = _safe_sqrt(t2)
    B = _one_minus_cos_over_t2(t2, t)[..., None, None]
    C = _t_minus_sin_over_t3(t2, t)[..., None, None]
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + B * W + C * (W @ W)


# ---------------------------------------------------------------------------
# SE(3): placements as (R, p); tangents nu = (v, w) in the LOCAL frame
# ---------------------------------------------------------------------------

def se3_mul(R1, p1, R2, p2):
    return R1 @ R2, (R1 @ p2[..., None])[..., 0] + p1


def se3_inv(R, p):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ p[..., None])[..., 0]


def se3_exp(nu):
    """Tangent (..., 6) [(v, w)] -> (R, p)."""
    v, w = nu[..., :3], nu[..., 3:]
    R = so3_exp(w)
    V = so3_left_jacobian(w)
    return R, (V @ v[..., None])[..., 0]


def se3_exp_quat(nu):
    """Tangent -> (quat, p) for configuration integration."""
    v, w = nu[..., :3], nu[..., 3:]
    q = so3_exp_quat(w)
    V = so3_left_jacobian(w)
    return q, (V @ v[..., None])[..., 0]


def _so3_left_jacobian_inv(w):
    t2 = jnp.sum(w * w, axis=-1)
    t = _safe_sqrt(t2)
    half = 0.5 * t
    # coefficient: 1/t^2 - (1+cos t)/(2 t sin t)  (Taylor: 1/12 + t^2/720 ...)
    s = jnp.sin(t)
    exact_den = 2.0 * t * s
    coef = jnp.where(
        t2 > 1e-8,
        1.0 / jnp.where(t2 > 1e-8, t2, 1.0)
        - (1.0 + jnp.cos(t)) / jnp.where(t2 > 1e-8, exact_den, 1.0),
        1.0 / 12.0 + t2 / 720.0 + t2 * t2 / 30240.0)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + coef[..., None, None] * (W @ W)


def se3_log(R, p):
    """(R, p) -> tangent (v, w)."""
    w = so3_log(R)
    Vinv = _so3_left_jacobian_inv(w)
    return jnp.concatenate([(Vinv @ p[..., None])[..., 0], w], axis=-1)
