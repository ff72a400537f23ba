"""Contact models: Baumgarte-stabilized acceleration contacts + impacts.

TPU-native re-expression of the reference's PointContact/SurfaceContact
(reference: include/robotoc/robot/point_contact.hxx:17-120,
surface_contact.hxx) — residuals are pure functions of (q, v, a) with
derivatives via forward-mode autodiff over the configuration tangent, and the
contact stack has a STATIC maximum dimension with activity handled by masks
downstream (no dynamic `dimf` resizing; SURVEY.md §7 design rule).

Residual conventions copied from the reference:
  * point contact (3D): LOCAL classical frame acceleration (linear)
      + Kv * LOCAL frame velocity (linear) + Kp * (world position - ref)
  * surface contact (6D): LOCAL spatial frame acceleration
      + Kv * LOCAL spatial velocity + Kp * log6(ref^{-1} M_frame)
  * impact velocity residual: LOCAL frame velocity (linear / spatial)
  * contact forces are expressed in the LOCAL contact frame.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops import lie
from ..ops.spatial import (force_cross, force_transform,
                           inertia_apply, motion_cross,
                           motion_transform_inv)
from . import robot as rm

POINT = 3
SURFACE = 6


@struct.dataclass
class ContactModel:
    """Static contact-frame configuration for one robot.

    Mirrors the reference's per-Robot contact lists
    (reference robot/robot.hpp:920-921 + contact_model_info.hpp). Mixed
    point (3D force) / surface (6D wrench) stacks use STATIC per-contact
    dims; activity enters as masks built by `force_mask` / `cone_mask`.
    """
    frame_ids: tuple = struct.field(pytree_node=False)
    types: tuple = struct.field(pytree_node=False)      # POINT or SURFACE
    frame_names: tuple = struct.field(pytree_node=False)
    kp: jnp.ndarray   # (nc,) Baumgarte position gain
    kv: jnp.ndarray   # (nc,) Baumgarte velocity gain
    rect: jnp.ndarray  # (nc, 2) foot rectangle (X, Y) for surface contacts

    @property
    def n_contacts(self) -> int:
        return len(self.frame_ids)

    @property
    def dims(self):
        return self.types

    @property
    def max_dimf(self) -> int:
        return sum(self.types)

    @property
    def f_offsets(self):
        off, out = 0, []
        for d in self.types:
            out.append(off)
            off += d
        return tuple(out)

    @property
    def cone_dims(self):
        """Rows of the linearized cone per contact: 5-facet friction
        pyramid (point) or 17-row rectangular contact wrench cone
        (surface; reference contact_wrench_cone.cpp computeCone)."""
        return tuple(5 if t == POINT else 17 for t in self.types)

    @property
    def dimc_cone(self) -> int:
        return sum(self.cone_dims)

    def force_mask(self, cmask):
        """(nc,) activity -> (max_dimf,) per-force-row mask."""
        return jnp.repeat(cmask, np.asarray(self.types),
                          total_repeat_length=self.max_dimf)

    def cone_mask(self, cmask):
        """(nc,) activity -> (dimc_cone,) per-cone-row mask."""
        return jnp.repeat(cmask, np.asarray(self.cone_dims),
                          total_repeat_length=self.dimc_cone)


def make_contacts(model: rm.RobotModel, frame_names, types=None,
                  baumgarte_time_step: float = 0.04,
                  rect=(0.05, 0.025)) -> ContactModel:
    """Baumgarte gains from a characteristic time step: Kv = 2/T, Kp = 1/T^2
    (reference contact_model_info.hpp:8-23). `rect` = (X, Y) foot half
    extents for surface contacts (reference contact_wrench_cone.hpp:66
    setRectangular)."""
    n = len(frame_names)
    if types is None:
        types = (POINT,) * n
    kv = 2.0 / baumgarte_time_step
    kp = 1.0 / baumgarte_time_step ** 2
    return ContactModel(
        frame_ids=tuple(model.frame_id(f) for f in frame_names),
        types=tuple(types),
        frame_names=tuple(frame_names),
        kp=jnp.full((n,), kp, dtype=model.dtype),
        kv=jnp.full((n,), kv, dtype=model.dtype),
        rect=jnp.broadcast_to(jnp.asarray(rect, model.dtype), (n, 2)),
    )


# ---------------------------------------------------------------------------
# Frame motion state (velocities + accelerations through the chain)
# ---------------------------------------------------------------------------

def joint_motion_state(model: rm.RobotModel, q, v, a):
    """Per-joint local spatial velocity and acceleration (no gravity term —
    purely kinematic), plus world placements."""
    vs, as_, Rs, ps = [], [], [], []
    for i in range(model.nj):
        Rl, pl = rm._joint_placement(model, i, q)
        par = model.parents[i]
        vJ = rm._joint_motion(model, i, v)
        aJ = rm._joint_motion(model, i, a)
        if par < 0:
            vi = vJ
            ai = aJ + motion_cross(vi, vJ)
            Rs.append(Rl)
            ps.append(pl)
        else:
            vi = motion_transform_inv(Rl, pl, vs[par]) + vJ
            ai = (motion_transform_inv(Rl, pl, as_[par]) + aJ
                  + motion_cross(vi, vJ))
            Rs.append(Rs[par] @ Rl)
            ps.append((Rs[par] @ pl[..., None])[..., 0] + ps[par])
        vs.append(vi)
        as_.append(ai)
    return vs, as_, Rs, ps


def _frame_state(model, contacts, c, q, v, a):
    """(R_w, p_w, v_local, a_local_spatial) of contact frame c."""
    vs, as_, Rs, ps = joint_motion_state(model, q, v, a)
    fid = contacts.frame_ids[c]
    par = model.frame_parents[fid]
    fR, fp = model.frame_R[fid], model.frame_p[fid]
    vf = motion_transform_inv(fR, fp, vs[par])
    af = motion_transform_inv(fR, fp, as_[par])
    Rw = Rs[par] @ fR
    pw = (Rs[par] @ fp[..., None])[..., 0] + ps[par]
    return Rw, pw, vf, af


# ---------------------------------------------------------------------------
# Residuals (reference point_contact.hxx / surface_contact.hxx)
# ---------------------------------------------------------------------------

def baumgarte_residual(model: rm.RobotModel, contacts: ContactModel,
                       q, v, a, p_ref, R_ref=None):
    """Stacked Baumgarte residual over ALL contacts: (..., max_dimf).

    p_ref: (nc, 3) desired world contact positions; R_ref: (nc, 3, 3)
    desired world contact rotations (surface contacts only; identity if
    None). Point: classical frame acceleration + Kv * linear velocity
    + Kp * position error (reference point_contact.hxx:17-120). Surface:
    spatial frame acceleration + Kv * spatial velocity
    + Kp * log6(M_ref^{-1} M(q)) (reference surface_contact.hxx)."""
    res = []
    for c in range(contacts.n_contacts):
        Rw, pw, vf, af = _frame_state(model, contacts, c, q, v, a)
        if contacts.types[c] == POINT:
            a_cl = af[..., :3] + jnp.cross(vf[..., 3:], vf[..., :3])
            r = (a_cl + contacts.kv[c] * vf[..., :3]
                 + contacts.kp[c] * (pw - p_ref[..., c, :]))
            res.append(r)
        else:
            Rr = (jnp.eye(3, dtype=q.dtype) if R_ref is None
                  else R_ref[..., c, :, :])
            pr = p_ref[..., c, :]
            # log6 of the relative placement M_ref^{-1} M(q), expressed in
            # the contact frame (reference surface_contact.hxx placement
            # residual)
            R_rel = jnp.swapaxes(Rr, -1, -2) @ Rw
            p_rel = (jnp.swapaxes(Rr, -1, -2)
                     @ (pw - pr)[..., None])[..., 0]
            from ..ops import lie as _lie
            err6 = _lie.se3_log(R_rel, p_rel)
            r = af + contacts.kv[c] * vf + contacts.kp[c] * err6
            res.append(r)
    return jnp.concatenate(res, axis=-1)


def impact_velocity_residual(model: rm.RobotModel, contacts: ContactModel,
                             q, v):
    """Post-impact contact-velocity residual (reference robot.hpp:491)."""
    res = []
    zeros = jnp.zeros_like(v)
    for c in range(contacts.n_contacts):
        _, _, vf, _ = _frame_state(model, contacts, c, q, v, zeros)
        res.append(vf[..., :3] if contacts.types[c] == POINT else vf)
    return jnp.concatenate(res, axis=-1)


def contact_position_residual(model: rm.RobotModel, contacts: ContactModel,
                              q, p_ref):
    """World contact-position error (switching constraint,
    reference robot.hpp:518)."""
    R_w, p_w = rm.forward_kinematics(model, q)
    res = []
    for c in range(contacts.n_contacts):
        _, pw = rm.frame_placement(model, contacts.frame_ids[c], R_w, p_w)
        res.append(pw - p_ref[..., c, :])
    return jnp.concatenate(res, axis=-1)


def contact_forces_to_joint(model: rm.RobotModel, contacts: ContactModel,
                            f_stack):
    """Local contact-frame forces (stacked, (..., max_dimf)) -> per-joint
    6D external forces (..., nj, 6) for RNEA
    (reference robot.hpp:542 setContactForces)."""
    batch = f_stack.shape[:-1]
    f_joint = jnp.zeros(batch + (model.nj, 6), dtype=f_stack.dtype)
    off = 0
    for c in range(contacts.n_contacts):
        d = contacts.types[c]
        fid = contacts.frame_ids[c]
        par = model.frame_parents[fid]
        fc = f_stack[..., off:off + d]
        if d == POINT:
            fc6 = jnp.concatenate(
                [fc, jnp.zeros(batch + (3,), dtype=f_stack.dtype)], axis=-1)
        else:
            fc6 = fc
        fj = force_transform(model.frame_R[fid], model.frame_p[fid], fc6)
        f_joint = f_joint.at[..., par, :].add(fj)
        off += d
    return f_joint


# ---------------------------------------------------------------------------
# Derivatives (tangent-space jacfwd; the reference uses Pinocchio's
# closed-form frame-acceleration derivatives — robot.hpp:460-534)
# ---------------------------------------------------------------------------

def baumgarte_derivatives(model, contacts, q, v, a, p_ref, R_ref=None):
    """(dB/dq, dB/dv, dB/da), each (..., max_dimf, nv). One fused tangent
    space (3nv tangents, single traced chain)."""
    nv = model.nv
    z = jnp.zeros(3 * nv, dtype=model.dtype)

    def f_all(e):
        return baumgarte_residual(
            model, contacts, rm.integrate(model, q, e[:nv]),
            v + e[nv:2 * nv], a + e[2 * nv:], p_ref, R_ref)

    J = jax.jacfwd(f_all)(z)
    return J[..., :nv], J[..., nv:2 * nv], J[..., 2 * nv:]


def impact_velocity_derivatives(model, contacts, q, v):
    nv = model.nv
    z = jnp.zeros(2 * nv, dtype=model.dtype)

    def f_all(e):
        return impact_velocity_residual(
            model, contacts, rm.integrate(model, q, e[:nv]), v + e[nv:])

    J = jax.jacfwd(f_all)(z)
    return J[..., :nv], J[..., nv:]


def contact_position_derivative(model, contacts, q, p_ref):
    z = jnp.zeros(model.nv, dtype=model.dtype)
    return jax.jacfwd(lambda e: contact_position_residual(
        model, contacts, rm.integrate(model, q, e), p_ref))(z)


# ---------------------------------------------------------------------------
# Fused stage kernel: ONE kinematic chain for inverse dynamics + Baumgarte
# contacts + friction-cone rotations (compile-size + runtime optimization:
# the separate rnea / baumgarte / cone evaluations each re-ran the joint
# chain; the reference gets the same sharing from Pinocchio's Data cache,
# robot.hpp:218 updateKinematics)
# ---------------------------------------------------------------------------

def _fused_forward(model, q, v, a, gravity_on):
    """Single forward sweep: per-joint placements, world poses, local
    velocities, KINEMATIC accelerations, and the separately-propagated
    gravity offset (linearity of the motion transform lets RNEA use
    a_total = a_kin + g_prop while Baumgarte uses a_kin)."""
    placements, Rs, ps, vs, as_kin, gprop = [], [], [], [], [], []
    if gravity_on:
        a0 = jnp.concatenate([-model.gravity,
                              jnp.zeros(3, model.dtype)])
    else:
        a0 = jnp.zeros(6, model.dtype)
    for i in range(model.nj):
        Rl, pl = rm._joint_placement(model, i, q)
        par = model.parents[i]
        vJ = rm._joint_motion(model, i, v)
        aJ = rm._joint_motion(model, i, a)
        if par < 0:
            vi = vJ
            ai = aJ + motion_cross(vi, vJ)
            gi = motion_transform_inv(Rl, pl, jnp.broadcast_to(a0, vJ.shape))
            Rw, pw = Rl, pl
        else:
            vi = motion_transform_inv(Rl, pl, vs[par]) + vJ
            ai = (motion_transform_inv(Rl, pl, as_kin[par]) + aJ
                  + motion_cross(vi, vJ))
            gi = motion_transform_inv(Rl, pl, gprop[par])
            Rw = Rs[par] @ Rl
            pw = (Rs[par] @ pl[..., None])[..., 0] + ps[par]
        placements.append((Rl, pl))
        Rs.append(Rw)
        ps.append(pw)
        vs.append(vi)
        as_kin.append(ai)
        gprop.append(gi)
    return placements, Rs, ps, vs, as_kin, gprop


def fused_stage_outputs(model, contacts: ContactModel, q, v, a, f_eff,
                        fric, p_ref, R_ref=None, gravity_on=True):
    """(tau, C, g_cone) from one shared chain.

    tau: inverse-dynamics torques RNEA(q,v,a) - J^T f  (nv,)
    C:   stacked Baumgarte residuals (max_dimf,)  [unmasked]
    g:   stacked cone residuals (dimc_cone,)
    """
    from ..constraints import friction_cone as fcone
    from ..ops import lie as _lie
    f_joint = contact_forces_to_joint(model, contacts, f_eff)
    placements, Rs, ps, vs, as_kin, gprop = _fused_forward(
        model, q, v, a, gravity_on)
    # --- RNEA backward pass (total accelerations) -----------------------
    nj = model.nj
    fs = []
    for i in range(nj):
        m_, c_, I_ = model.mass[i], model.com[i], model.inertia[i]
        ai_tot = as_kin[i] + gprop[i]
        fi = inertia_apply(m_, c_, I_, ai_tot) + force_cross(
            vs[i], inertia_apply(m_, c_, I_, vs[i]))
        fi = fi - f_joint[..., i, :]
        fs.append(fi)
    tau_parts = [None] * nj
    for i in reversed(range(nj)):
        jt = model.jtypes[i]
        if jt == rm.FREE:
            tau_parts[i] = fs[i]
        elif jt == rm.REVOLUTE:
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
    # --- contact-frame states (shared chain) ----------------------------
    C_rows, g_rows, dgdf_blocks = [], [], []
    offs = contacts.f_offsets
    for c in range(contacts.n_contacts):
        fid = contacts.frame_ids[c]
        par = model.frame_parents[fid]
        fR, fp = model.frame_R[fid], model.frame_p[fid]
        vf = motion_transform_inv(fR, fp, vs[par])
        af = motion_transform_inv(fR, fp, as_kin[par])
        Rw = Rs[par] @ fR
        pw = (Rs[par] @ fp[..., None])[..., 0] + ps[par]
        if contacts.types[c] == POINT:
            a_cl = af[..., :3] + jnp.cross(vf[..., 3:], vf[..., :3])
            C_rows.append(a_cl + contacts.kv[c] * vf[..., :3]
                          + contacts.kp[c] * (pw - p_ref[..., c, :]))
            fl = f_eff[offs[c]:offs[c] + 3]
            Cm = fcone.cone_matrix(fric[c], q.dtype)
            g_rows.append(Cm @ (Rw @ fl))
            dgdf_blocks.append(Cm @ Rw)
        else:
            Rr = (jnp.eye(3, dtype=q.dtype) if R_ref is None
                  else R_ref[..., c, :, :])
            pr = p_ref[..., c, :]
            R_rel = jnp.swapaxes(Rr, -1, -2) @ Rw
            p_rel = (jnp.swapaxes(Rr, -1, -2) @ (pw - pr)[..., None])[..., 0]
            err6 = _lie.se3_log(R_rel, p_rel)
            C_rows.append(af + contacts.kv[c] * vf
                          + contacts.kp[c] * err6)
            wl = f_eff[offs[c]:offs[c] + 6]
            W = fcone.wrench_cone_matrix(fric[c], contacts.rect[c, 0],
                                         contacts.rect[c, 1], q.dtype)
            g_rows.append(W @ wl)
            dgdf_blocks.append(W)
    C = jnp.concatenate(C_rows, axis=-1)
    g = jnp.concatenate(g_rows, axis=-1)
    dgdf = jnp.zeros((contacts.dimc_cone, contacts.max_dimf), q.dtype)
    r0 = 0
    for c, blk in enumerate(dgdf_blocks):
        nr, ncol = blk.shape
        dgdf = dgdf.at[r0:r0 + nr, offs[c]:offs[c] + ncol].set(blk)
        r0 += nr
    return tau, C, g, dgdf


def fused_stage_derivatives(model, contacts, q, v, a, f_eff, fric,
                            p_ref, R_ref=None, gravity_on=True):
    """Values + Jacobians of (tau, C, g) with ONE fused 3nv-tangent jacfwd
    of the shared chain. Returns
      (tau, C, g), (dtau_dq, dtau_dv, M), (dCdq, dCdv, Jc), dgdq."""
    nv = model.nv
    nf = contacts.max_dimf
    tau, C, g, dgdf = fused_stage_outputs(model, contacts, q, v, a, f_eff,
                                          fric, p_ref, R_ref, gravity_on)
    z = jnp.zeros(3 * nv, dtype=model.dtype)

    def f_all(e):
        t2, C2, g2, _ = fused_stage_outputs(
            model, contacts, rm.integrate(model, q, e[:nv]),
            v + e[nv:2 * nv], a + e[2 * nv:], f_eff, fric, p_ref, R_ref,
            gravity_on)
        return jnp.concatenate([t2, C2, g2])

    J = jax.jacfwd(f_all)(z)
    Jt, Jc, Jg = J[:nv], J[nv:nv + nf], J[nv + nf:]
    return ((tau, C, g, dgdf),
            (Jt[:, :nv], Jt[:, nv:2 * nv], Jt[:, 2 * nv:]),
            (Jc[:, :nv], Jc[:, nv:2 * nv], Jc[:, 2 * nv:]),
            Jg[:, :nv])


def fused_impact_outputs(model, contacts: ContactModel, q, dv, vpost,
                         lam_eff, fric):
    """(tau_imp, Cvel, g_cone) for the impact stage from one shared chain:
    impulse dynamics RNEAImpact(q, dv) - J^T Lambda, post-impact contact
    velocity at (q, vpost), impact cone on Lambda."""
    from ..constraints import friction_cone as fcone
    f_joint = contact_forces_to_joint(model, contacts, lam_eff)
    # chain at (q, dv) with zero velocity, gravity-free = impulse dynamics;
    # but the contact VELOCITY residual needs vpost — run the cheap
    # velocity propagation for vpost alongside (no accelerations).
    placements, Rs, ps, vs0, as_kin, _ = _fused_forward(
        model, q, jnp.zeros_like(dv), dv, gravity_on=False)
    nj = model.nj
    fs = []
    for i in range(nj):
        m_, c_, I_ = model.mass[i], model.com[i], model.inertia[i]
        fi = inertia_apply(m_, c_, I_, as_kin[i]) + force_cross(
            vs0[i], inertia_apply(m_, c_, I_, vs0[i]))
        fi = fi - f_joint[..., i, :]
        fs.append(fi)
    tau_parts = [None] * nj
    for i in reversed(range(nj)):
        jt = model.jtypes[i]
        if jt == rm.FREE:
            tau_parts[i] = fs[i]
        elif jt == rm.REVOLUTE:
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
    # post-impact velocities through the same placements
    vps = []
    for i in range(nj):
        Rl, pl = placements[i]
        par = model.parents[i]
        vJ = rm._joint_motion(model, i, vpost)
        if par < 0:
            vps.append(vJ)
        else:
            vps.append(motion_transform_inv(Rl, pl, vps[par]) + vJ)
    C_rows, g_rows, dgdf_blocks = [], [], []
    offs = contacts.f_offsets
    for c in range(contacts.n_contacts):
        fid = contacts.frame_ids[c]
        par = model.frame_parents[fid]
        fR, fp = model.frame_R[fid], model.frame_p[fid]
        vf = motion_transform_inv(fR, fp, vps[par])
        Rw = Rs[par] @ fR
        if contacts.types[c] == POINT:
            C_rows.append(vf[..., :3])
            fl = lam_eff[offs[c]:offs[c] + 3]
            Cm = fcone.cone_matrix(fric[c], q.dtype)
            g_rows.append(Cm @ (Rw @ fl))
            dgdf_blocks.append(Cm @ Rw)
        else:
            C_rows.append(vf)
            wl = lam_eff[offs[c]:offs[c] + 6]
            W = fcone.wrench_cone_matrix(fric[c], contacts.rect[c, 0],
                                         contacts.rect[c, 1], q.dtype)
            g_rows.append(W @ wl)
            dgdf_blocks.append(W)
    dgdf = jnp.zeros((contacts.dimc_cone, contacts.max_dimf), q.dtype)
    r0 = 0
    for c, blk in enumerate(dgdf_blocks):
        nr, ncol = blk.shape
        dgdf = dgdf.at[r0:r0 + nr, offs[c]:offs[c] + ncol].set(blk)
        r0 += nr
    return tau, jnp.concatenate(C_rows, axis=-1), \
        jnp.concatenate(g_rows, axis=-1), dgdf


def fused_impact_derivatives(model, contacts, q, dv, v, lam_eff, fric):
    """Values + Jacobians for the impact stage with one fused jacfwd over
    (dq, ddv) — the post-impact velocity residual's v-dependence equals its
    dv-dependence (vpost = v + dv), so dC/dv rides the ddv tangents.
    Returns (tau, C, g), (dtau_dq, Mi), (dCdq, Jc), dgdq."""
    nv = model.nv
    nf = contacts.max_dimf
    tau, C, g, dgdf = fused_impact_outputs(model, contacts, q, dv, v + dv,
                                           lam_eff, fric)
    z = jnp.zeros(2 * nv, dtype=model.dtype)

    def f_all(e):
        t2, C2, g2, _ = fused_impact_outputs(
            model, contacts, rm.integrate(model, q, e[:nv]),
            dv + e[nv:], v + dv + e[nv:], lam_eff, fric)
        return jnp.concatenate([t2, C2, g2])

    J = jax.jacfwd(f_all)(z)
    Jt, Jc, Jg = J[:nv], J[nv:nv + nf], J[nv + nf:]
    return ((tau, C, g, dgdf), (Jt[:, :nv], Jt[:, nv:]),
            (Jc[:, :nv], Jc[:, nv:]), Jg[:, :nv])
