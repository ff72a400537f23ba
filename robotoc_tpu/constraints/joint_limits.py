"""Joint-space box constraints (position / velocity / torque / acceleration).

Covers the reference's eight JointXxxLower/UpperLimit components
(reference: include/robotoc/constraints/joint_{position,velocity,torques,
acceleration}_{lower,upper}_limit.hpp) as one fused, masked stack:

    e = [ q_lb - q_J ; q_J - q_ub ; v_lb - v_J ; v_J - v_ub ;
          u_lb - u   ; u - u_ub ]            (6 * dimu rows)

Because every Jacobian is a signed selection matrix, PDIPM condensing reduces
to diagonal adds — no matmuls — and the whole horizon stack evaluates in one
VPU pass. Infinite bounds are handled by masking rows out.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..models import robot as rm
from . import pdipm


@struct.dataclass
class JointLimits:
    q_lower: jnp.ndarray   # (dimu,)
    q_upper: jnp.ndarray
    v_limit: jnp.ndarray   # (dimu,) symmetric
    u_limit: jnp.ndarray   # (dimu,) symmetric
    mask: jnp.ndarray      # (6*dimu,) finite-bound mask

    @property
    def dimc(self) -> int:
        return self.mask.shape[-1]


def make_joint_limits(model: rm.RobotModel, q_lower=None, q_upper=None,
                      v_limit=None, u_limit=None) -> JointLimits:
    dt = model.dtype

    def pick(val, default):
        return jnp.asarray(val, dtype=dt) if val is not None else default

    ql = pick(q_lower, model.q_lower)
    qu = pick(q_upper, model.q_upper)
    vl = pick(v_limit, model.v_limit)
    ul = pick(u_limit, model.u_limit)
    mask = jnp.concatenate([jnp.isfinite(ql), jnp.isfinite(qu),
                            jnp.isfinite(vl), jnp.isfinite(vl),
                            jnp.isfinite(ul), jnp.isfinite(ul)])
    big = jnp.asarray(1e8, dtype=dt)
    return JointLimits(
        q_lower=jnp.where(jnp.isfinite(ql), ql, -big),
        q_upper=jnp.where(jnp.isfinite(qu), qu, big),
        v_limit=jnp.where(jnp.isfinite(vl), vl, big),
        u_limit=jnp.where(jnp.isfinite(ul), ul, big),
        mask=mask)


def constraint_values(model, lim: JointLimits, q, v, u):
    """e(q, v, u) <= 0, stacked (..., 6*dimu). q_J/v_J are the actuated
    tails for a floating base."""
    nj = model.dimu
    qj = q[..., model.nq - nj:]
    vj = v[..., model.nv - nj:]
    return jnp.concatenate([
        lim.q_lower - qj, qj - lim.q_upper,
        -lim.v_limit - vj, vj - lim.v_limit,
        -lim.u_limit - u, u - lim.u_limit,
    ], axis=-1)


def constraint_direction(model, lim: JointLimits, dq, dv, du):
    """de given primal directions (same stacking; signed selections)."""
    nj = model.dimu
    dqj = dq[..., model.nv - nj:]
    dvj = dv[..., model.nv - nj:]
    return jnp.concatenate([-dqj, dqj, -dvj, dvj, -du, du], axis=-1)


def condense(model, lim: JointLimits, e, s, z, barrier):
    """PDIPM condensing onto (q, v, u) diagonals.

    Returns (Hq_diag, Hv_diag, Hu_diag  — each (..., nv or dimu),
             gq, gv, gu) where H/g are the condensed Hessian diagonal and
    gradient contributions in FULL tangent coordinates (passive rows zero).
    """
    nj = model.dimu
    d = pdipm.condensing_diag(s, z, lim.mask)
    r = pdipm.condensing_rhs(e, s, z, barrier, lim.mask)
    dql, dqu, dvl, dvu, dul, duu = jnp.split(d, 6, axis=-1)
    rql, rqu, rvl, rvu, rul, ruu = jnp.split(r, 6, axis=-1)
    pad = model.nv - nj

    def full(x):
        if pad == 0:
            return x
        z0 = jnp.zeros(x.shape[:-1] + (pad,), dtype=x.dtype)
        return jnp.concatenate([z0, x], axis=-1)

    Hq = full(dql + dqu)
    Hv = full(dvl + dvu)
    Hu = dul + duu
    gq = full(-rql + rqu)
    gv = full(-rvl + rvu)
    gu = -rul + ruu
    return Hq, Hv, Hu, gq, gv, gu


def dual_residual(model, lim: JointLimits, z):
    """Constraint-dual contribution to (lq, lv, lu): J^T z."""
    nj = model.dimu
    zql, zqu, zvl, zvu, zul, zuu = jnp.split(z, 6, axis=-1)
    pad = model.nv - nj

    def full(x):
        if pad == 0:
            return x
        z0 = jnp.zeros(x.shape[:-1] + (pad,), dtype=x.dtype)
        return jnp.concatenate([z0, x], axis=-1)

    return full(zqu - zql), full(zvu - zvl), zuu - zul
