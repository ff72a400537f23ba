"""Joint-space box constraints (position / velocity / acceleration / torque).

Covers the reference's eight JointXxxLower/UpperLimit components
(reference: include/robotoc/constraints/joint_{position,velocity,torques,
acceleration}_{lower,upper}_limit.hpp) as one fused, masked stack:

    e = [ q_lb - q_J ; q_J - q_ub ; v_lb - v_J ; v_J - v_ub ;
          u_lb - u   ; u - u_ub   ; a_lb - a_J ; a_J - a_ub ]   (8*dimu rows)

Because every Jacobian is a signed selection matrix, PDIPM condensing reduces
to diagonal adds — no matmuls — and the whole horizon stack evaluates in one
VPU pass. Infinite bounds are handled by masking rows out (acceleration
limits default to infinite, i.e. off).
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
    a_limit: jnp.ndarray   # (dimu,) symmetric (acceleration)
    mask: jnp.ndarray      # (8*dimu,) finite-bound mask

    @property
    def dimc(self) -> int:
        return self.mask.shape[-1]


def make_joint_limits(model: rm.RobotModel, q_lower=None, q_upper=None,
                      v_limit=None, u_limit=None,
                      a_limit=None) -> JointLimits:
    dt = model.dtype

    def pick(val, default):
        return jnp.asarray(val, dtype=dt) if val is not None else default

    inf = jnp.full((model.dimu,), jnp.inf, dtype=dt)
    ql = pick(q_lower, model.q_lower)
    qu = pick(q_upper, model.q_upper)
    vl = pick(v_limit, model.v_limit)
    ul = pick(u_limit, model.u_limit)
    al = pick(a_limit, inf)
    mask = jnp.concatenate([jnp.isfinite(ql), jnp.isfinite(qu),
                            jnp.isfinite(vl), jnp.isfinite(vl),
                            jnp.isfinite(ul), jnp.isfinite(ul),
                            jnp.isfinite(al), jnp.isfinite(al)])
    big = jnp.asarray(1e8, dtype=dt)
    return JointLimits(
        q_lower=jnp.where(jnp.isfinite(ql), ql, -big),
        q_upper=jnp.where(jnp.isfinite(qu), qu, big),
        v_limit=jnp.where(jnp.isfinite(vl), vl, big),
        u_limit=jnp.where(jnp.isfinite(ul), ul, big),
        a_limit=jnp.where(jnp.isfinite(al), al, big),
        mask=mask)


def constraint_values(model, lim: JointLimits, q, v, u, a=None):
    """e(q, v, u, a) <= 0, stacked (..., 8*dimu). q_J/v_J/a_J are the
    actuated tails for a floating base; a=None means acceleration rows at
    zero (only valid when a_limit is infinite, i.e. masked off)."""
    nj = model.dimu
    qj = q[..., model.nq - nj:]
    vj = v[..., model.nv - nj:]
    aj = (jnp.zeros_like(vj) if a is None
          else a[..., model.nv - nj:])
    return jnp.concatenate([
        lim.q_lower - qj, qj - lim.q_upper,
        -lim.v_limit - vj, vj - lim.v_limit,
        -lim.u_limit - u, u - lim.u_limit,
        -lim.a_limit - aj, aj - lim.a_limit,
    ], axis=-1)


def constraint_direction(model, lim: JointLimits, dq, dv, du, da=None):
    """de given primal directions (same stacking; signed selections)."""
    nj = model.dimu
    dqj = dq[..., model.nv - nj:]
    dvj = dv[..., model.nv - nj:]
    daj = (jnp.zeros_like(dvj) if da is None
           else da[..., model.nv - nj:])
    return jnp.concatenate([-dqj, dqj, -dvj, dvj, -du, du, -daj, daj],
                           axis=-1)


def condense(model, lim: JointLimits, e, s, z, barrier):
    """PDIPM condensing onto (q, v, u, a) diagonals.

    Returns (Hq_diag, Hv_diag, Hu_diag, Ha_diag, gq, gv, gu, ga) where H/g
    are the condensed Hessian diagonal and gradient contributions in FULL
    tangent coordinates (passive rows zero; u rows stay dimu)."""
    nj = model.dimu
    d = pdipm.condensing_diag(s, z, lim.mask)
    r = pdipm.condensing_rhs(e, s, z, barrier, lim.mask)
    dql, dqu, dvl, dvu, dul, duu, dal, dau = jnp.split(d, 8, axis=-1)
    rql, rqu, rvl, rvu, rul, ruu, ral, rau = jnp.split(r, 8, axis=-1)
    pad = model.nv - nj

    def full(x):
        if pad == 0:
            return x
        z0 = jnp.zeros(x.shape[:-1] + (pad,), dtype=x.dtype)
        return jnp.concatenate([z0, x], axis=-1)

    Hq = full(dql + dqu)
    Hv = full(dvl + dvu)
    Hu = dul + duu
    Ha = full(dal + dau)
    gq = full(-rql + rqu)
    gv = full(-rvl + rvu)
    gu = -rul + ruu
    ga = full(-ral + rau)
    return Hq, Hv, Hu, Ha, gq, gv, gu, ga


def dual_residual(model, lim: JointLimits, z):
    """Constraint-dual contribution to (lq, lv, lu, la): J^T z."""
    nj = model.dimu
    zql, zqu, zvl, zvu, zul, zuu, zal, zau = jnp.split(z, 8, axis=-1)
    pad = model.nv - nj

    def full(x):
        if pad == 0:
            return x
        z0 = jnp.zeros(x.shape[:-1] + (pad,), dtype=x.dtype)
        return jnp.concatenate([z0, x], axis=-1)

    return (full(zqu - zql), full(zvu - zvl), zuu - zul,
            full(zau - zal))
