"""Rotation helpers (reference include/robotoc/utils/rotation.hpp:16-84)."""
from __future__ import annotations

import jax.numpy as jnp

from ..ops import lie


def rotation_matrix_from_quaternion(quat_xyzw):
    """(x, y, z, w) quaternion -> rotation matrix
    (reference rotation.hpp RotationMatrixFromQuaternion)."""
    return lie.quat_to_rot(jnp.asarray(quat_xyzw))


def quaternion_from_rotation_matrix(R):
    """Rotation matrix -> (x, y, z, w) quaternion (Shepperd's method,
    branch-free via jnp.where)."""
    R = jnp.asarray(R)
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    qw = 0.5 * jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12))
    qx = (R[..., 2, 1] - R[..., 1, 2]) / (4.0 * qw)
    qy = (R[..., 0, 2] - R[..., 2, 0]) / (4.0 * qw)
    qz = (R[..., 1, 0] - R[..., 0, 1]) / (4.0 * qw)
    q = jnp.stack([qx, qy, qz, qw], axis=-1)
    return lie.quat_normalize(q)


def rotation_matrix_from_normal_vector(normal):
    """Rotation whose z-axis is the (unit) surface normal
    (reference rotation.hpp RotationMatrixFromNormalVector)."""
    n = jnp.asarray(normal)
    n = n / jnp.linalg.norm(n)
    # pick the world axis least aligned with n to build a tangent basis
    ref = jnp.where(jnp.abs(n[0]) < 0.9,
                    jnp.asarray([1.0, 0.0, 0.0], n.dtype),
                    jnp.asarray([0.0, 1.0, 0.0], n.dtype))
    x = ref - jnp.dot(ref, n) * n
    x = x / jnp.linalg.norm(x)
    y = jnp.cross(n, x)
    return jnp.stack([x, y, n], axis=-1)


def project_rotation_matrix_z(R):
    """Project onto a pure yaw rotation (reference ProjectRotationMatrix
    with Z axis)."""
    R = jnp.asarray(R)
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([c, -s, z], axis=-1),
        jnp.stack([s, c, z], axis=-1),
        jnp.stack([z, z, o], axis=-1),
    ], axis=-2)
