"""Rigid-body model as a JAX pytree + kinematics/dynamics kernels.

TPU-native replacement for the reference's `Robot` wrapper over Pinocchio
(reference: include/robotoc/robot/robot.hpp:32 — Lie-group config ops,
kinematics, RNEA(+derivatives), mass matrix, contact-space inverses). Design
departures from the reference:

  * the model is a pure pytree of arrays + a static skeleton (parents/joint
    types as Python tuples), so every algorithm below is a pure function —
    jit/vmap/grad-safe, no per-thread mutable Data workspaces;
  * loops over joints are unrolled at trace time (nj is static and small,
    7-30 for the supported robots), letting XLA fuse the whole chain into one
    kernel; there is no data-dependent control flow;
  * all kernels broadcast over leading batch axes, so horizons x scenario
    fleets batch into single TPU kernels instead of OpenMP threads;
  * the "impact model" (gravity-free copy, reference robot.hpp:915) is just
    the same model called with gravity zeroed — no second model object.

Conventions: configuration q = [p(3), quat(x,y,z,w), q_joints] for floating
base; tangent v = [v_lin_local(3), omega_local(3), v_joints] (Pinocchio
free-flyer convention, matching the reference's solution layout).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops import lie
from ..ops.spatial import (force_cross, force_transform, inertia_apply,
                           inertia_matrix, motion_cross, motion_transform_inv)
from . import urdf as _urdf
from .urdf import FREE, PRISMATIC, REVOLUTE


@struct.dataclass
class RobotModel:
    # --- static skeleton (hashable, compile-time) ---
    name: str = struct.field(pytree_node=False)
    nq: int = struct.field(pytree_node=False)
    nv: int = struct.field(pytree_node=False)
    nj: int = struct.field(pytree_node=False)
    floating_base: bool = struct.field(pytree_node=False)
    parents: tuple = struct.field(pytree_node=False)       # per joint
    jtypes: tuple = struct.field(pytree_node=False)        # per joint
    q_offs: tuple = struct.field(pytree_node=False)        # per joint q index
    v_offs: tuple = struct.field(pytree_node=False)        # per joint v index
    frame_parents: tuple = struct.field(pytree_node=False)
    frame_names: tuple = struct.field(pytree_node=False)
    joint_names: tuple = struct.field(pytree_node=False)
    # --- traced leaves ---
    Xtree_R: jnp.ndarray    # (nj, 3, 3) joint placement in parent joint frame
    Xtree_p: jnp.ndarray    # (nj, 3)
    axis: jnp.ndarray       # (nj, 3)
    mass: jnp.ndarray       # (nj,)
    com: jnp.ndarray        # (nj, 3)   body com in joint frame
    inertia: jnp.ndarray    # (nj, 3, 3) rotational inertia about joint origin
    frame_R: jnp.ndarray    # (nf, 3, 3) frame placement in parent joint frame
    frame_p: jnp.ndarray    # (nf, 3)
    q_lower: jnp.ndarray    # (dimu,) actuated position limits
    q_upper: jnp.ndarray
    v_limit: jnp.ndarray    # (dimu,)
    u_limit: jnp.ndarray    # (dimu,)
    gravity: jnp.ndarray    # (3,) world gravity acceleration
    generalized_momentum_bias: object = None
    """Optional (nv,) bias subtracted from the RNEA torque (the
    reference's runtime-settable RobotProperties,
    robot_properties.hpp:36 + robot.hxx:540-542). Set via
    `set_robot_properties`."""

    # ---- dims (reference robot.hpp:707-735) ----
    @property
    def dim_passive(self) -> int:
        return 6 if self.floating_base else 0

    @property
    def dimu(self) -> int:
        return self.nv - self.dim_passive

    @property
    def nframes(self) -> int:
        return len(self.frame_names)

    def frame_id(self, name: str) -> int:
        return self.frame_names.index(name)

    @property
    def dtype(self):
        return self.Xtree_R.dtype

    @property
    def total_mass(self):
        return jnp.sum(self.mass)


def from_spec(spec: _urdf.ModelSpec, dtype=jnp.float64) -> RobotModel:
    nj = len(spec.joints)
    q_offs, v_offs = [], []
    q_off, v_off = 0, 0
    for j in spec.joints:
        q_offs.append(q_off)
        v_offs.append(v_off)
        if j.jtype == FREE:
            q_off += 7
            v_off += 6
        else:
            q_off += 1
            v_off += 1
    assert q_off == spec.nq and v_off == spec.nv
    act = [j for j in spec.joints if j.jtype != FREE]

    def arr(x):
        return jnp.asarray(np.asarray(x), dtype=dtype)

    I_o = []
    for b, j in zip(spec.bodies, spec.joints):
        h = _urdf._hat(b.com)
        I_o.append(b.I_c - b.mass * (h @ h))

    return RobotModel(
        name=spec.name,
        nq=spec.nq, nv=spec.nv, nj=nj,
        floating_base=spec.floating_base,
        parents=tuple(j.parent for j in spec.joints),
        jtypes=tuple(j.jtype for j in spec.joints),
        q_offs=tuple(q_offs), v_offs=tuple(v_offs),
        frame_parents=tuple(f.parent_joint for f in spec.frames),
        frame_names=tuple(f.name for f in spec.frames),
        joint_names=tuple(j.name for j in spec.joints),
        Xtree_R=arr(np.stack([j.R for j in spec.joints])),
        Xtree_p=arr(np.stack([j.p for j in spec.joints])),
        axis=arr(np.stack([j.axis for j in spec.joints])),
        mass=arr([b.mass for b in spec.bodies]),
        com=arr(np.stack([b.com for b in spec.bodies])),
        inertia=arr(np.stack(I_o)),
        frame_R=arr(np.stack([f.R for f in spec.frames])),
        frame_p=arr(np.stack([f.p for f in spec.frames])),
        q_lower=arr([j.lower for j in act]),
        q_upper=arr([j.upper for j in act]),
        v_limit=arr([j.velocity for j in act]),
        u_limit=arr([j.effort for j in act]),
        gravity=arr([0.0, 0.0, -9.81]),
    )


def from_urdf(path: str, floating_base: bool = False, dtype=jnp.float64,
              name: Optional[str] = None) -> RobotModel:
    return from_spec(_urdf.parse_urdf(path, floating_base, name), dtype)


# ---------------------------------------------------------------------------
# Configuration-space (Lie group) operations
# (reference robot.hpp:80-207: integrate/subtract/interpolate/normalize)
# ---------------------------------------------------------------------------

def integrate(model: RobotModel, q, dq):
    """q ⊕ dq: right-integrate a tangent step (free-flyer via SE(3) exp)."""
    if not model.floating_base:
        return q + dq
    p, quat, qj = q[..., :3], q[..., 3:7], q[..., 7:]
    R = lie.quat_to_rot(quat)
    dquat, dp = lie.se3_exp_quat(dq[..., :6])
    p_new = p + (R @ dp[..., None])[..., 0]
    quat_new = lie.quat_mul(quat, dquat)
    return jnp.concatenate([p_new, quat_new, qj + dq[..., 6:]], axis=-1)


def difference(model: RobotModel, q0, q1):
    """q1 ⊖ q0 (tangent at q0): log6(M0^{-1} M1) for the base."""
    if not model.floating_base:
        return q1 - q0
    p0, quat0, qj0 = q0[..., :3], q0[..., 3:7], q0[..., 7:]
    p1, quat1, qj1 = q1[..., :3], q1[..., 3:7], q1[..., 7:]
    R0 = lie.quat_to_rot(quat0)
    quat_rel = lie.quat_mul(lie.quat_conj(quat0), quat1)
    R_rel = lie.quat_to_rot(quat_rel)
    p_rel = (jnp.swapaxes(R0, -1, -2) @ (p1 - p0)[..., None])[..., 0]
    nu = lie.se3_log(R_rel, p_rel)
    return jnp.concatenate([nu, qj1 - qj0], axis=-1)


def interpolate(model: RobotModel, q0, q1, t):
    return integrate(model, q0, t * difference(model, q0, q1))


def normalize(model: RobotModel, q):
    if not model.floating_base:
        return q
    return jnp.concatenate(
        [q[..., :3], lie.quat_normalize(q[..., 3:7]), q[..., 7:]], axis=-1)


def neutral(model: RobotModel):
    if model.floating_base:
        q = jnp.zeros(model.nq, dtype=model.dtype)
        return q.at[6].set(1.0)
    return jnp.zeros(model.nq, dtype=model.dtype)


def random_configuration(model: RobotModel, key):
    lo = jnp.where(jnp.isfinite(model.q_lower), model.q_lower, -3.14)
    hi = jnp.where(jnp.isfinite(model.q_upper), model.q_upper, 3.14)
    qj = jax.random.uniform(key, (model.dimu,), dtype=model.dtype,
                            minval=lo, maxval=hi)
    if not model.floating_base:
        return qj
    k1, k2 = jax.random.split(key)
    p = jax.random.uniform(k1, (3,), dtype=model.dtype, minval=-1., maxval=1.)
    quat = lie.quat_normalize(
        jax.random.normal(k2, (4,), dtype=model.dtype))
    return jnp.concatenate([p, quat, qj])


def tangent_jacobian(model: RobotModel, q, f):
    """d f(q ⊕ e)/de at e=0 — generic configuration-tangent Jacobian.

    Used for dSubtractConfiguration / frame Jacobians / cost quadratization
    (reference robot.hpp:150-207). jacfwd keeps the chain batched on TPU.
    """
    z = jnp.zeros(model.nv, dtype=model.dtype)
    return jax.jacfwd(lambda e: f(integrate(model, q, e)))(z)


def d_difference_dq0(model: RobotModel, q0, q1):
    return tangent_jacobian(model, q0, lambda q: difference(model, q, q1))


def d_difference_dq1(model: RobotModel, q0, q1):
    return tangent_jacobian(model, q1, lambda q: difference(model, q0, q))


# ---------------------------------------------------------------------------
# Kinematics
# ---------------------------------------------------------------------------

def _joint_placement(model: RobotModel, i: int, q):
    """Placement (R, p) of joint i's child frame in its parent joint frame."""
    jt = model.jtypes[i]
    XR, Xp = model.Xtree_R[i], model.Xtree_p[i]
    if jt == FREE:
        qo = model.q_offs[i]
        Rq = lie.quat_to_rot(q[..., qo + 3:qo + 7])
        pq = q[..., qo:qo + 3]
        R = XR @ Rq
        p = (XR @ pq[..., None])[..., 0] + Xp
        return R, p
    qi = q[..., model.q_offs[i]]
    ax = model.axis[i]
    if jt == REVOLUTE:
        Rj = lie.so3_exp(qi[..., None] * ax)
        return XR @ Rj, jnp.broadcast_to(Xp, qi.shape + (3,))
    if jt == PRISMATIC:
        p = Xp + qi[..., None] * ax
        return jnp.broadcast_to(XR, qi.shape + (3, 3)), p
    raise ValueError(jt)


def forward_kinematics(model: RobotModel, q):
    """World placements of all joint frames: (R_w (..., nj, 3, 3), p_w).

    Level-batched: same-type joints at the same tree depth evaluate as one
    batched op (chain_levels) — op count scales with tree DEPTH, not joint
    count."""
    nj = model.nj
    batch = q.shape[:-1]
    RS = jnp.zeros(batch + (nj, 3, 3), q.dtype)
    PS = jnp.zeros(batch + (nj, 3), q.dtype)
    for jt, idxs in chain_levels(model):
        idx = np.asarray(idxs)
        par = np.asarray([model.parents[i] for i in idxs])
        k = len(idxs)
        if jt == FREE:
            qo = model.q_offs[idxs[0]]
            Rq = lie.quat_to_rot(q[..., qo + 3:qo + 7])
            Rl = (model.Xtree_R[idx[0]] @ Rq)[..., None, :, :]
            pl = ((model.Xtree_R[idx[0]] @ q[..., qo:qo + 3, None])[..., 0]
                  + model.Xtree_p[idx[0]])[..., None, :]
        else:
            qoffs = np.asarray([model.q_offs[i] for i in idxs])
            qi = q[..., qoffs]
            ax = model.axis[idx]
            if jt == REVOLUTE:
                Rj = lie.so3_exp(qi[..., None] * ax)
                Rl = model.Xtree_R[idx] @ Rj
                pl = jnp.broadcast_to(model.Xtree_p[idx],
                                      batch + (k, 3))
            else:
                Rl = jnp.broadcast_to(model.Xtree_R[idx],
                                      batch + (k, 3, 3))
                pl = model.Xtree_p[idx] + qi[..., None] * ax
        if par[0] < 0:
            Rw, pw = Rl, pl
        else:
            Rw = RS[..., par, :, :] @ Rl
            pw = (RS[..., par, :, :] @ pl[..., None])[..., 0] \
                + PS[..., par, :]
        RS = RS.at[..., idx, :, :].set(Rw)
        PS = PS.at[..., idx, :].set(pw)
    return RS, PS


def frame_placement(model: RobotModel, fid: int, R_w, p_w):
    """World placement of operational frame `fid` given joint FK results."""
    par = model.frame_parents[fid]
    fR, fp = model.frame_R[fid], model.frame_p[fid]
    if par < 0:
        shape = p_w.shape[:-2]
        return (jnp.broadcast_to(fR, shape + (3, 3)),
                jnp.broadcast_to(fp, shape + (3,)))
    R = R_w[..., par, :, :] @ fR
    p = (R_w[..., par, :, :] @ fp[..., None])[..., 0] + p_w[..., par, :]
    return R, p


def frame_position(model: RobotModel, fid: int, q):
    R_w, p_w = forward_kinematics(model, q)
    return frame_placement(model, fid, R_w, p_w)[1]


def joint_velocities(model: RobotModel, q, v):
    """Local spatial velocity of each joint frame: (..., nj, 6)."""
    vs = []
    for i in range(model.nj):
        Rl, pl = _joint_placement(model, i, q)
        vJ = _joint_motion(model, i, v)
        par = model.parents[i]
        if par < 0:
            vs.append(vJ)
        else:
            vs.append(motion_transform_inv(Rl, pl, vs[par]) + vJ)
    return jnp.stack(vs, axis=-2)


def _joint_motion(model: RobotModel, i: int, vec):
    """S_i @ vec_i — the joint-space motion contribution of joint i."""
    jt = model.jtypes[i]
    vo = model.v_offs[i]
    if jt == FREE:
        return vec[..., vo:vo + 6]
    vi = vec[..., vo]
    ax = model.axis[i]
    zeros = jnp.zeros_like(vi[..., None] * ax)
    if jt == REVOLUTE:
        return jnp.concatenate([zeros, vi[..., None] * ax], axis=-1)
    return jnp.concatenate([vi[..., None] * ax, zeros], axis=-1)


def frame_velocity(model: RobotModel, fid: int, q, v):
    """LOCAL spatial velocity (linear, angular) of frame fid: (..., 6)."""
    vj = joint_velocities(model, q, v)
    par = model.frame_parents[fid]
    if par < 0:
        return jnp.zeros(v.shape[:-1] + (6,), dtype=v.dtype)
    return motion_transform_inv(model.frame_R[fid], model.frame_p[fid],
                                vj[..., par, :])


def com(model: RobotModel, q):
    """World center of mass (reference robot.hpp:323)."""
    R_w, p_w = forward_kinematics(model, q)
    ci = (R_w @ model.com[..., None])[..., 0] + p_w
    return jnp.sum(model.mass[:, None] * ci, axis=-2) / jnp.sum(model.mass)


# ---------------------------------------------------------------------------
# Dynamics: RNEA, CRBA, derivatives
# ---------------------------------------------------------------------------

def rnea(model: RobotModel, q, v, a, f_joint=None, gravity_on: bool = True):
    """Inverse dynamics tau(q, v, a) - external forces, all local-frame.

    f_joint: optional (..., nj, 6) external forces expressed in each joint's
    local frame (built by the contact layer from contact-frame forces).
    Returns tau (..., nv); for a floating base, tau[..., :6] is the passive
    (unactuated) force residual.  (reference robot.hpp:567 `RNEA`)
    """
    nj = model.nj
    vs, as_, placements = [], [], []
    if gravity_on:
        a0 = jnp.concatenate([-model.gravity, jnp.zeros(3, model.dtype)])
    else:
        a0 = jnp.zeros(6, model.dtype)
    fs = []
    for i in range(nj):
        Rl, pl = _joint_placement(model, i, q)
        placements.append((Rl, pl))
        par = model.parents[i]
        vJ = _joint_motion(model, i, v)
        aJ = _joint_motion(model, i, a)
        if par < 0:
            vi = vJ
            ai = motion_transform_inv(Rl, pl, jnp.broadcast_to(
                a0, vJ.shape)) + aJ + motion_cross(vi, vJ)
        else:
            vi = motion_transform_inv(Rl, pl, vs[par]) + vJ
            ai = (motion_transform_inv(Rl, pl, as_[par]) + aJ
                  + motion_cross(vi, vJ))
        vs.append(vi)
        as_.append(ai)
        m, c, I = model.mass[i], model.com[i], model.inertia[i]
        fi = inertia_apply(m, c, I, ai) + force_cross(
            vi, inertia_apply(m, c, I, vi))
        if f_joint is not None:
            fi = fi - f_joint[..., i, :]
        fs.append(fi)

    tau_parts = [None] * nj
    for i in reversed(range(nj)):
        jt = model.jtypes[i]
        if jt == FREE:
            tau_parts[i] = fs[i]
        elif jt == REVOLUTE:
            tau_parts[i] = jnp.sum(fs[i][..., 3:] * model.axis[i], axis=-1,
                                   keepdims=True)
        else:
            tau_parts[i] = jnp.sum(fs[i][..., :3] * model.axis[i], axis=-1,
                                   keepdims=True)
        par = model.parents[i]
        if par >= 0:
            Rl, pl = placements[i]
            fs[par] = fs[par] + force_transform(Rl, pl, fs[i])
    tau = jnp.concatenate(tau_parts, axis=-1)
    if gravity_on and model.generalized_momentum_bias is not None:
        # runtime-settable RobotProperties (reference robot.hxx:540-542;
        # not applied to the impact RNEA, matching the reference)
        tau = tau - model.generalized_momentum_bias
    return tau


def set_robot_properties(model: RobotModel,
                         generalized_momentum_bias=None) -> RobotModel:
    """Runtime-settable robot properties (reference RobotProperties,
    robot_properties.hpp:36 + Robot::setRobotProperties,
    robot.cpp:469-476): returns a model with the generalized-momentum
    bias installed (None or an all-zero vector clears it)."""
    if generalized_momentum_bias is not None:
        b = jnp.asarray(generalized_momentum_bias, model.dtype)
        if b.shape != (model.nv,):
            raise ValueError(
                f"generalized_momentum_bias must have shape ({model.nv},)"
                f", got {b.shape}")
        import numpy as _np
        if not _np.any(_np.asarray(b)):
            generalized_momentum_bias = None
        else:
            generalized_momentum_bias = b
    return model.replace(
        generalized_momentum_bias=generalized_momentum_bias)


def rnea_impact(model: RobotModel, q, dv, f_joint=None):
    """Impulse dynamics residual M(q) dv - J^T Lambda (gravity-free,
    zero-velocity RNEA; reference robot.hpp:611 `RNEAImpact`)."""
    z = jnp.zeros_like(dv)
    return rnea(model, q, z, dv, f_joint=f_joint, gravity_on=False)


def _force_xform_matrix(R, p):
    """Dense 6x6 force transform child->parent: [[R, 0], [p^ R, R]]."""
    Z = jnp.zeros_like(R)
    top = jnp.concatenate([R, Z], axis=-1)
    bot = jnp.concatenate([lie.hat(p) @ R, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _joint_subspace(model: RobotModel, i: int):
    """S_i as a static (6, ndof_i) matrix (numpy, trace-time constant)."""
    jt = model.jtypes[i]
    if jt == FREE:
        return jnp.eye(6, dtype=model.dtype)
    ax = model.axis[i]
    z = jnp.zeros_like(ax)
    if jt == REVOLUTE:
        return jnp.concatenate([z, ax])[:, None]
    return jnp.concatenate([ax, z])[:, None]


def crba(model: RobotModel, q):
    """Joint-space mass matrix M(q) via composite rigid bodies
    (reference robot.hpp:644 computeMinv's LLT source)."""
    nj, nv = model.nj, model.nv
    placements = [
        _joint_placement(model, i, q) for i in range(nj)]
    Ic = [inertia_matrix(model.mass[i], model.com[i], model.inertia[i])
          for i in range(nj)]
    batch = placements[0][1].shape[:-1]
    M = jnp.zeros(batch + (nv, nv), dtype=model.dtype)

    def vdim(i):
        return 6 if model.jtypes[i] == FREE else 1

    for i in reversed(range(nj)):
        par = model.parents[i]
        if par >= 0:
            Xf = _force_xform_matrix(*placements[i])
            Ic[par] = Ic[par] + Xf @ Ic[i] @ jnp.swapaxes(Xf, -1, -2)
        S_i = _joint_subspace(model, i)
        F = Ic[i] @ S_i                                   # (..., 6, di)
        vi = model.v_offs[i]
        Mii = jnp.swapaxes(S_i, -1, -2) @ F
        M = M.at[..., vi:vi + vdim(i), vi:vi + vdim(i)].set(Mii)
        j = i
        while model.parents[j] >= 0:
            F = _force_xform_matrix(*placements[j]) @ F
            j = model.parents[j]
            S_j = _joint_subspace(model, j)
            Mij = jnp.swapaxes(F, -1, -2) @ S_j           # (..., di, dj)
            vj = model.v_offs[j]
            M = M.at[..., vi:vi + vdim(i), vj:vj + vdim(j)].set(Mij)
            M = M.at[..., vj:vj + vdim(j), vi:vi + vdim(i)].set(
                jnp.swapaxes(Mij, -1, -2))
    return M


def nonlinear_effects(model: RobotModel, q, v):
    """Coriolis + gravity torque h(q, v) = RNEA(q, v, 0)."""
    return rnea(model, q, v, jnp.zeros_like(v))


def rnea_derivatives(model: RobotModel, q, v, a, f_joint=None,
                     gravity_on: bool = True):
    """(dtau/dq (tangent), dtau/dv, dtau/da = M).

    Forward-mode autodiff of the RNEA chain with ONE fused tangent space
    (3nv tangents of a single traced chain — one batched kernel on the
    VPU/MXU instead of three, 3x smaller trace). External forces are held
    constant in their local joint frames, matching Pinocchio's
    computeRNEADerivatives semantics used by the reference
    (reference robot.hpp:593).
    """
    nv = model.nv
    z = jnp.zeros(3 * nv, dtype=model.dtype)

    def f_all(e):
        return rnea(model, integrate(model, q, e[:nv]), v + e[nv:2 * nv],
                    a + e[2 * nv:], f_joint, gravity_on)

    J = jax.jacfwd(f_all)(z)                       # (nv, 3nv)
    return J[:, :nv], J[:, nv:2 * nv], J[:, 2 * nv:]


def rnea_impact_derivatives(model: RobotModel, q, dv, f_joint=None):
    """(dres/dq, dres/ddv) of the impulse dynamics residual
    (reference robot.hpp:630). One fused tangent space, as in
    rnea_derivatives."""
    nv = model.nv
    z = jnp.zeros(2 * nv, dtype=model.dtype)

    def f_all(e):
        return rnea_impact(model, integrate(model, q, e[:nv]),
                           dv + e[nv:], f_joint)

    J = jax.jacfwd(f_all)(z)
    return J[:, :nv], J[:, nv:]


# ---------------------------------------------------------------------------
# Level-batched chain structure (TPU op-count optimization)
# ---------------------------------------------------------------------------

def chain_levels(model: RobotModel):
    """Static level decomposition of the joint tree: joints of the SAME
    type at the SAME depth batch into one set of tensor ops (a quadruped's
    4 identical legs evaluate as one (4, ...) batched op per depth level
    instead of 12 scalar chains — the op-COUNT, not FLOP, is what bounds
    small-kinematics throughput on TPU).

    Returns a tuple of (jtype, joint_indices tuple) in depth order.
    """
    depth = []
    for i in range(model.nj):
        p = model.parents[i]
        depth.append(0 if p < 0 else depth[p] + 1)
    buckets = {}
    for i in range(model.nj):
        buckets.setdefault((depth[i], model.jtypes[i]), []).append(i)
    return tuple((jt, tuple(idxs))
                 for (d, jt), idxs in sorted(buckets.items()))
