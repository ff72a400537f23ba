"""Batched 6D spatial algebra (Featherstone), linear-first ordering.

Motion vectors are (v_lin, omega), force vectors are (f, tau), both expressed
in a LOCAL frame; placements are (R, p) pairs (see ops/lie.py). All functions
broadcast over leading batch dimensions — on TPU the batch axes (horizon
grids x scenarios) map onto VPU lanes / MXU tiles.

Replaces the Eigen spatial-algebra usage inside Pinocchio that the reference
leans on (reference: include/robotoc/robot/robot.hpp kinematics/dynamics
surface).
"""
from __future__ import annotations

import jax.numpy as jnp

from .lie import hat


def cross3(a, b):
    return jnp.cross(a, b)


def motion_cross(v, m):
    """crm(v) @ m for motion vectors v, m."""
    lv, wv = v[..., :3], v[..., 3:]
    lm, wm = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [cross3(wv, lm) + cross3(lv, wm), cross3(wv, wm)], axis=-1)


def force_cross(v, f):
    """crf(v) @ f = -crm(v)^T f, for a motion v and force f."""
    lv, wv = v[..., :3], v[..., 3:]
    lf, wf = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [cross3(wv, lf), cross3(wv, wf) + cross3(lv, lf)], axis=-1)


def motion_transform(R, p, m):
    """Motion expressed in child frame -> parent frame, placement (R, p) of
    child in parent: l' = R l + p x (R w); w' = R w."""
    l = (R @ m[..., :3, None])[..., 0]
    w = (R @ m[..., 3:, None])[..., 0]
    return jnp.concatenate([l + cross3(p, w), w], axis=-1)


def motion_transform_inv(R, p, m):
    """Motion expressed in parent frame -> child frame."""
    w = m[..., 3:]
    l = m[..., :3] - cross3(p, w)
    Rt = jnp.swapaxes(R, -1, -2)
    return jnp.concatenate(
        [(Rt @ l[..., None])[..., 0], (Rt @ w[..., None])[..., 0]], axis=-1)


def force_transform(R, p, f):
    """Force expressed in child frame -> parent frame (dual of motion_transform_inv)."""
    lf = (R @ f[..., :3, None])[..., 0]
    wf = (R @ f[..., 3:, None])[..., 0]
    return jnp.concatenate([lf, wf + cross3(p, lf)], axis=-1)


def force_transform_inv(R, p, f):
    """Force expressed in parent frame -> child frame."""
    Rt = jnp.swapaxes(R, -1, -2)
    lf = f[..., :3]
    wf = f[..., 3:] - cross3(p, lf)
    return jnp.concatenate(
        [(Rt @ lf[..., None])[..., 0], (Rt @ wf[..., None])[..., 0]], axis=-1)


def inertia_apply(m, c, I_o, v):
    """Spatial inertia (mass m, com c, rotational inertia I_o about the frame
    origin) applied to motion v -> force.

    f = m*l - m*c x w ;  n = I_o w + m*c x l
    """
    l, w = v[..., :3], v[..., 3:]
    mc = m[..., None] * c
    f = m[..., None] * l - cross3(mc, w)
    n = (I_o @ w[..., None])[..., 0] + cross3(mc, l)
    return jnp.concatenate([f, n], axis=-1)


def inertia_matrix(m, c, I_o, dtype=None):
    """Dense 6x6 spatial inertia [[m E, -m c^], [m c^, I_o]]."""
    mc_hat = m[..., None, None] * hat(c)
    eye = jnp.eye(3, dtype=I_o.dtype) * m[..., None, None]
    top = jnp.concatenate([eye, -mc_hat], axis=-1)
    bot = jnp.concatenate([mc_hat, I_o], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)
