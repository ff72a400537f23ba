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
    inv_damping: float = struct.field(pytree_node=False, default=0.0)
    """Damping added to the contact-space Schur complement's diagonal on
    ACTIVE rows during the [[M, J^T], [J, -D]] inversion (reference
    robot_model_info.hpp:95 contact_inv_damping + robot.hxx:662-663:
    JMinvJt.diagonal() += contact_inv_damping). 0 = exact inversion."""

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
                  rect=(0.05, 0.025),
                  contact_inv_damping: float = 0.0) -> ContactModel:
    """Baumgarte gains from a characteristic time step: Kv = 2/T, Kp = 1/T^2
    (reference contact_model_info.hpp:8-23). `rect` = (X, Y) foot half
    extents for surface contacts (reference contact_wrench_cone.hpp:66
    setRectangular). `contact_inv_damping`: regularization of the
    contact-space Schur-complement inversion for ill-conditioned active
    contact Jacobians (reference robot_model_info.hpp:95)."""
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
        inv_damping=float(contact_inv_damping),
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
# robot.hpp:218 updateKinematics). The chain is LEVEL-BATCHED: same-type
# joints at the same tree depth (a quadruped's 4 identical legs) evaluate
# as one batched tensor op per level — the op COUNT, not the FLOPs, bounds
# small-kinematics throughput on TPU (robot.py chain_levels).
# ---------------------------------------------------------------------------

def _joint_stack(model, idxs, name):
    import numpy as _np
    return _np.asarray([getattr(model, name)[i] for i in idxs])


def _fused_forward(model, q, v, a, gravity_on):
    """Single level-batched forward sweep. Returns per-joint arrays
    (PL_R (nj,3,3), PL_p (nj,3), RS, PS, VS (nj,6), AS_kin, GP): joint
    placements, world poses, local velocities, KINEMATIC accelerations and
    the separately-propagated gravity offset (linearity of the motion
    transform lets RNEA use a_total = a_kin + g_prop while Baumgarte uses
    a_kin)."""
    import numpy as _np
    nj = model.nj
    dt = q.dtype
    if gravity_on:
        a0 = jnp.concatenate([-model.gravity, jnp.zeros(3, dt)])
    else:
        a0 = jnp.zeros(6, dt)
    PL_R = jnp.zeros((nj, 3, 3), dt)
    PL_p = jnp.zeros((nj, 3), dt)
    RS = jnp.zeros((nj, 3, 3), dt)
    PS = jnp.zeros((nj, 3), dt)
    VS = jnp.zeros((nj, 6), dt)
    AS = jnp.zeros((nj, 6), dt)
    GP = jnp.zeros((nj, 6), dt)
    for jt, idxs in rm.chain_levels(model):
        idx = _np.asarray(idxs)
        par = _np.asarray([model.parents[i] for i in idxs])
        k = len(idxs)
        if jt == rm.FREE:
            qo = model.q_offs[idxs[0]]
            vo = model.v_offs[idxs[0]]
            Rq = lie.quat_to_rot(q[qo + 3:qo + 7])
            Rl = (model.Xtree_R[idx[0]] @ Rq)[None]
            pl = ((model.Xtree_R[idx[0]] @ q[qo:qo + 3])
                  + model.Xtree_p[idx[0]])[None]
            vJ = v[vo:vo + 6][None]
            aJ = a[vo:vo + 6][None]
        else:
            qoffs = _np.asarray([model.q_offs[i] for i in idxs])
            voffs = _np.asarray([model.v_offs[i] for i in idxs])
            qi = q[qoffs]                              # (k,)
            ax = model.axis[idx]                       # (k, 3)
            zk = jnp.zeros((k, 3), dt)
            if jt == rm.REVOLUTE:
                Rj = lie.so3_exp(qi[:, None] * ax)
                Rl = model.Xtree_R[idx] @ Rj
                pl = jnp.broadcast_to(model.Xtree_p[idx], (k, 3))
                vJ = jnp.concatenate([zk, v[voffs][:, None] * ax], axis=-1)
                aJ = jnp.concatenate([zk, a[voffs][:, None] * ax], axis=-1)
            else:                                       # PRISMATIC
                Rl = jnp.broadcast_to(model.Xtree_R[idx], (k, 3, 3))
                pl = model.Xtree_p[idx] + qi[:, None] * ax
                vJ = jnp.concatenate([v[voffs][:, None] * ax, zk], axis=-1)
                aJ = jnp.concatenate([a[voffs][:, None] * ax, zk], axis=-1)
        if par[0] < 0:                                  # root level
            vi = vJ
            ai = aJ + motion_cross(vi, vJ)
            gi = motion_transform_inv(Rl, pl, jnp.broadcast_to(a0, (k, 6)))
            Rw, pw = Rl, pl
        else:
            vi = motion_transform_inv(Rl, pl, VS[par]) + vJ
            ai = (motion_transform_inv(Rl, pl, AS[par]) + aJ
                  + motion_cross(vi, vJ))
            gi = motion_transform_inv(Rl, pl, GP[par])
            Rw = RS[par] @ Rl
            pw = (RS[par] @ pl[..., None])[..., 0] + PS[par]
        PL_R = PL_R.at[idx].set(Rl)
        PL_p = PL_p.at[idx].set(pl)
        RS = RS.at[idx].set(Rw)
        PS = PS.at[idx].set(pw)
        VS = VS.at[idx].set(vi)
        AS = AS.at[idx].set(ai)
        GP = GP.at[idx].set(gi)
    return PL_R, PL_p, RS, PS, VS, AS, GP


def _rnea_backward(model, PL_R, PL_p, VS, A_tot, f_joint):
    """Level-batched RNEA backward pass: per-joint net forces from the
    TOTAL accelerations, child-to-parent accumulation, torque projection."""
    import numpy as _np
    nj = model.nj
    dt = VS.dtype
    FS = (inertia_apply(model.mass, model.com, model.inertia, A_tot)
          + force_cross(VS, inertia_apply(model.mass, model.com,
                                          model.inertia, VS)))
    if f_joint is not None:
        FS = FS - f_joint
    tau = jnp.zeros(model.nv, dt)
    for jt, idxs in reversed(rm.chain_levels(model)):
        idx = _np.asarray(idxs)
        par = _np.asarray([model.parents[i] for i in idxs])
        if jt == rm.FREE:
            vo = model.v_offs[idxs[0]]
            tau = tau.at[vo:vo + 6].set(FS[idx[0]])
        else:
            voffs = _np.asarray([model.v_offs[i] for i in idxs])
            ax = model.axis[idx]
            if jt == rm.REVOLUTE:
                tau = tau.at[voffs].set(
                    jnp.sum(FS[idx][:, 3:] * ax, axis=-1))
            else:
                tau = tau.at[voffs].set(
                    jnp.sum(FS[idx][:, :3] * ax, axis=-1))
        if par[0] >= 0:
            FS = FS.at[par].add(
                force_transform(PL_R[idx], PL_p[idx], FS[idx]))
    return tau


def _contact_groups(contacts):
    """Static per-type contact groups with gather index tables."""
    import numpy as _np
    groups = []
    offs = contacts.f_offsets
    cone_offs = []
    r0 = 0
    for d in contacts.cone_dims:
        cone_offs.append(r0)
        r0 += d
    for typ in (POINT, SURFACE):
        cs = [c for c in range(contacts.n_contacts)
              if contacts.types[c] == typ]
        if cs:
            groups.append(dict(
                typ=typ, cs=_np.asarray(cs),
                fids=_np.asarray([contacts.frame_ids[c] for c in cs]),
                f_idx=_np.asarray([[offs[c] + j for j in range(typ)]
                                   for c in cs]),
                cone_idx=_np.asarray(
                    [[cone_offs[c] + j
                      for j in range(contacts.cone_dims[c])]
                     for c in cs])))
    return groups


def _task_outputs(model, contacts, RS, PS):
    """(nc*3 + 3,) task vector from an already-computed forward sweep:
    world positions of every contact frame (in contact order) + the CoM —
    the gait MPC's task-cost kinematics (costs/task_cost.py
    MultiFrameTaskCost._task) as a byproduct of the shared chain."""
    import numpy as _np
    dt = PS.dtype
    feet = jnp.zeros((contacts.n_contacts, 3), dt)
    for gr in _contact_groups(contacts):
        cs, fids = gr["cs"], gr["fids"]
        pars = _np.asarray([model.frame_parents[f] for f in fids])
        pw = (RS[pars] @ model.frame_p[fids][..., None])[..., 0] + PS[pars]
        feet = feet.at[cs].set(pw)
    ci = (RS @ model.com[..., None])[..., 0] + PS
    com = jnp.sum(model.mass[:, None] * ci, axis=-2) / jnp.sum(model.mass)
    return jnp.concatenate([feet.reshape(-1), com])


def fused_stage_outputs(model, contacts: ContactModel, q, v, a, f_eff,
                        fric, p_ref, R_ref=None, gravity_on=True,
                        with_task=False):
    """(tau, C, g_cone, dgdf[, task]) from one shared level-batched chain.

    tau: inverse-dynamics torques RNEA(q,v,a) - J^T f  (nv,)
    C:   stacked Baumgarte residuals (max_dimf,)  [unmasked]
    g:   stacked cone residuals (dimc_cone,)
    dgdf: (dimc_cone, max_dimf) cone force Jacobian (values; block diag).
    task (with_task=True): contact-frame world positions + CoM (3nc+3,)
    for the fused task-cost path.
    """
    import numpy as _np
    from ..constraints import friction_cone as fcone
    dt = q.dtype
    f_joint = contact_forces_to_joint(model, contacts, f_eff)
    PL_R, PL_p, RS, PS, VS, AS, GP = _fused_forward(model, q, v, a,
                                                    gravity_on)
    tau = _rnea_backward(model, PL_R, PL_p, VS, AS + GP, f_joint)
    # --- contact frames, batched per contact type -----------------------
    C = jnp.zeros(contacts.max_dimf, dt)
    g = jnp.zeros(contacts.dimc_cone, dt)
    dgdf = jnp.zeros((contacts.dimc_cone, contacts.max_dimf), dt)
    for gr in _contact_groups(contacts):
        cs, fids = gr["cs"], gr["fids"]
        pars = _np.asarray([model.frame_parents[f] for f in fids])
        fR = model.frame_R[fids]
        fp = model.frame_p[fids]
        vf = motion_transform_inv(fR, fp, VS[pars])
        af = motion_transform_inv(fR, fp, AS[pars])
        Rw = RS[pars] @ fR
        pw = (RS[pars] @ fp[..., None])[..., 0] + PS[pars]
        kv = contacts.kv[cs][:, None]
        kp = contacts.kp[cs][:, None]
        if gr["typ"] == POINT:
            a_cl = af[:, :3] + jnp.cross(vf[:, 3:], vf[:, :3])
            res = a_cl + kv * vf[:, :3] + kp * (pw - p_ref[cs])
            fl = f_eff[gr["f_idx"]]                      # (k, 3)
            Cm = jax.vmap(lambda fc_: fcone.cone_matrix(fc_, dt))(fric[cs])
            fW = (Rw @ fl[..., None])[..., 0]
            gv = (Cm @ fW[..., None])[..., 0]            # (k, 5)
            dg = Cm @ Rw                                  # (k, 5, 3)
        else:
            Rr = (jnp.broadcast_to(jnp.eye(3, dtype=dt), Rw.shape)
                  if R_ref is None else R_ref[cs])
            R_rel = jnp.swapaxes(Rr, -1, -2) @ Rw
            p_rel = (jnp.swapaxes(Rr, -1, -2)
                     @ (pw - p_ref[cs])[..., None])[..., 0]
            err6 = lie.se3_log(R_rel, p_rel)
            res = af + kv * vf + kp * err6
            wl = f_eff[gr["f_idx"]]                      # (k, 6)
            W = jax.vmap(lambda mu, xy: fcone.wrench_cone_matrix(
                mu, xy[0], xy[1], dt))(fric[cs], contacts.rect[cs])
            gv = (W @ wl[..., None])[..., 0]
            dg = W
        C = C.at[gr["f_idx"].reshape(-1)].set(res.reshape(-1))
        g = g.at[gr["cone_idx"].reshape(-1)].set(gv.reshape(-1))
        ci = gr["cone_idx"][..., :, None]                # (k, rows, 1)
        fi = gr["f_idx"][..., None, :]                   # (k, 1, cols)
        dgdf = dgdf.at[ci, fi].set(dg)
    if with_task:
        return tau, C, g, dgdf, _task_outputs(model, contacts, RS, PS)
    return tau, C, g, dgdf


def fused_stage_derivatives(model, contacts, q, v, a, f_eff, fric,
                            p_ref, R_ref=None, gravity_on=True,
                            with_task=False):
    """Values + Jacobians of (tau, C, g) with ONE fused 3nv-tangent jacfwd
    of the shared chain. Returns
      ((tau, C, g, dgdf), (dtau_dq, dtau_dv, M), (dCdq, dCdv, Jc), dgdq)
    plus, when with_task, a trailing (task, dtask_dq) pair — the task-cost
    kinematics rows ride the SAME chain and the same q-tangents instead of
    a second FK + jacfwd (round-2 profile: the separate cost chain was
    15 ms of an 83 ms build)."""
    nv = model.nv
    nf = contacts.max_dimf
    out = fused_stage_outputs(model, contacts, q, v, a, f_eff,
                              fric, p_ref, R_ref, gravity_on,
                              with_task=with_task)
    if with_task:
        tau, C, g, dgdf, task = out
    else:
        tau, C, g, dgdf = out
    z = jnp.zeros(3 * nv, dtype=model.dtype)

    def f_all(e):
        o2 = fused_stage_outputs(
            model, contacts, rm.integrate(model, q, e[:nv]),
            v + e[nv:2 * nv], a + e[2 * nv:], f_eff, fric, p_ref, R_ref,
            gravity_on, with_task=with_task)
        if with_task:
            return jnp.concatenate([o2[0], o2[1], o2[2], o2[4]])
        return jnp.concatenate([o2[0], o2[1], o2[2]])

    J = jax.jacfwd(f_all)(z)
    ng = contacts.dimc_cone
    Jt, Jc, Jg = J[:nv], J[nv:nv + nf], J[nv + nf:nv + nf + ng]
    base = ((tau, C, g, dgdf),
            (Jt[:, :nv], Jt[:, nv:2 * nv], Jt[:, 2 * nv:]),
            (Jc[:, :nv], Jc[:, nv:2 * nv], Jc[:, 2 * nv:]),
            Jg[:, :nv])
    if with_task:
        Jtask = J[nv + nf + ng:, :nv]
        return base + ((task, Jtask),)
    return base


def _velocity_forward(model, PL_R, PL_p, vpost):
    """Level-batched velocity-only propagation through FIXED placements."""
    import numpy as _np
    nj = model.nj
    VP = jnp.zeros((nj, 6), vpost.dtype)
    for jt, idxs in rm.chain_levels(model):
        idx = _np.asarray(idxs)
        par = _np.asarray([model.parents[i] for i in idxs])
        k = len(idxs)
        if jt == rm.FREE:
            vo = model.v_offs[idxs[0]]
            vJ = vpost[vo:vo + 6][None]
        else:
            voffs = _np.asarray([model.v_offs[i] for i in idxs])
            ax = model.axis[idx]
            zk = jnp.zeros((k, 3), vpost.dtype)
            if jt == rm.REVOLUTE:
                vJ = jnp.concatenate([zk, vpost[voffs][:, None] * ax],
                                     axis=-1)
            else:
                vJ = jnp.concatenate([vpost[voffs][:, None] * ax, zk],
                                     axis=-1)
        if par[0] < 0:
            vi = vJ
        else:
            vi = motion_transform_inv(PL_R[idx], PL_p[idx], VP[par]) + vJ
        VP = VP.at[idx].set(vi)
    return VP


def fused_impact_outputs(model, contacts: ContactModel, q, dv, vpost,
                         lam_eff, fric, with_task=False):
    """(tau_imp, Cvel, g_cone, dgdf[, task]) for the impact stage from one
    shared chain: impulse dynamics RNEAImpact(q, dv) - J^T Lambda,
    post-impact contact velocity at (q, vpost), impact cone on Lambda."""
    import numpy as _np
    from ..constraints import friction_cone as fcone
    dt = q.dtype
    f_joint = contact_forces_to_joint(model, contacts, lam_eff)
    PL_R, PL_p, RS, PS, VS0, AS, _ = _fused_forward(
        model, q, jnp.zeros_like(dv), dv, gravity_on=False)
    tau = _rnea_backward(model, PL_R, PL_p, VS0, AS, f_joint)
    VP = _velocity_forward(model, PL_R, PL_p, vpost)
    C = jnp.zeros(contacts.max_dimf, dt)
    g = jnp.zeros(contacts.dimc_cone, dt)
    dgdf = jnp.zeros((contacts.dimc_cone, contacts.max_dimf), dt)
    for gr in _contact_groups(contacts):
        cs, fids = gr["cs"], gr["fids"]
        pars = _np.asarray([model.frame_parents[f] for f in fids])
        fR = model.frame_R[fids]
        fp = model.frame_p[fids]
        vf = motion_transform_inv(fR, fp, VP[pars])
        Rw = RS[pars] @ fR
        if gr["typ"] == POINT:
            res = vf[:, :3]
            fl = lam_eff[gr["f_idx"]]
            Cm = jax.vmap(lambda fc_: fcone.cone_matrix(fc_, dt))(fric[cs])
            gv = (Cm @ (Rw @ fl[..., None]))[..., 0]
            dg = Cm @ Rw
        else:
            res = vf
            wl = lam_eff[gr["f_idx"]]
            W = jax.vmap(lambda mu, xy: fcone.wrench_cone_matrix(
                mu, xy[0], xy[1], dt))(fric[cs], contacts.rect[cs])
            gv = (W @ wl[..., None])[..., 0]
            dg = W
        C = C.at[gr["f_idx"].reshape(-1)].set(res.reshape(-1))
        g = g.at[gr["cone_idx"].reshape(-1)].set(gv.reshape(-1))
        ci = gr["cone_idx"][..., :, None]
        fi = gr["f_idx"][..., None, :]
        dgdf = dgdf.at[ci, fi].set(dg)
    if with_task:
        return tau, C, g, dgdf, _task_outputs(model, contacts, RS, PS)
    return tau, C, g, dgdf


def fused_impact_derivatives(model, contacts, q, dv, v, lam_eff, fric,
                             with_task=False):
    """Values + Jacobians for the impact stage with one fused jacfwd over
    (dq, ddv) — the post-impact velocity residual's v-dependence equals its
    dv-dependence (vpost = v + dv), so dC/dv rides the ddv tangents.
    Returns ((tau, C, g, dgdf), (dtau_dq, Mi), (dCdq, Jc), dgdq) plus,
    when with_task, a trailing (task, dtask_dq) pair."""
    nv = model.nv
    nf = contacts.max_dimf
    out = fused_impact_outputs(model, contacts, q, dv, v + dv,
                               lam_eff, fric, with_task=with_task)
    if with_task:
        tau, C, g, dgdf, task = out
    else:
        tau, C, g, dgdf = out
    z = jnp.zeros(2 * nv, dtype=model.dtype)

    def f_all(e):
        o2 = fused_impact_outputs(
            model, contacts, rm.integrate(model, q, e[:nv]),
            dv + e[nv:], v + dv + e[nv:], lam_eff, fric,
            with_task=with_task)
        if with_task:
            return jnp.concatenate([o2[0], o2[1], o2[2], o2[4]])
        return jnp.concatenate([o2[0], o2[1], o2[2]])

    J = jax.jacfwd(f_all)(z)
    ng = contacts.dimc_cone
    Jt, Jc, Jg = J[:nv], J[nv:nv + nf], J[nv + nf:nv + nf + ng]
    base = ((tau, C, g, dgdf), (Jt[:, :nv], Jt[:, nv:]),
            (Jc[:, :nv], Jc[:, nv:]), Jg[:, :nv])
    if with_task:
        Jtask = J[nv + nf + ng:, :nv]
        return base + ((task, Jtask),)
    return base
