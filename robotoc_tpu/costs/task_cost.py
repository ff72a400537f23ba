"""Task-space and CoM tracking costs with time-varying references.

Re-expression of the reference's TaskSpace3DCost / CoMCost / periodic
references (reference: include/robotoc/cost/task_space_3d_cost.hpp,
com_cost.hpp, periodic_swing_foot_ref.hpp:69, periodic_com_ref.hpp:63,
mpc/mpc_periodic_*_ref). References are closed-form functions of the grid
time t (where-based, jit-safe) instead of virtual update_ref calls.

Gauss-Newton quadratization: residual r(q) = task(q) - ref(t),
lq = dt J^T W r, Qqq = dt J^T W J with J the task tangent Jacobian.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..models import robot as rm
from .base import ImpactQuad, StageQuad, TerminalQuad


# ---------------------------------------------------------------------------
# References
# ---------------------------------------------------------------------------

@struct.dataclass
class ConstantRef:
    p: jnp.ndarray

    def __call__(self, t):
        return self.p, jnp.asarray(1.0, self.p.dtype)


@struct.dataclass
class PeriodicSwingFootRef:
    """Cyclic swing-foot trajectory (reference periodic_swing_foot_ref.hpp):
    active only during swing; linear advance by step_length with a
    sin^2-shaped height profile of apex step_height."""
    p0: jnp.ndarray          # initial foot position (3,)
    step_length: jnp.ndarray  # (3,) displacement per cycle
    step_height: jnp.ndarray  # scalar
    t0: jnp.ndarray          # first swing start
    period_swing: jnp.ndarray
    period: jnp.ndarray      # full cycle duration
    first_half: bool = struct.field(pytree_node=False, default=False)
    """If True the first (partial) step advances by half a step."""

    def __call__(self, t):
        dtype = self.p0.dtype
        tau = t - self.t0
        cycle = jnp.floor(tau / self.period)
        tin = tau - cycle * self.period
        in_swing = (tau >= 0.0) & (tin < self.period_swing)
        phase = jnp.clip(tin / self.period_swing, 0.0, 1.0)
        if self.first_half:
            adv0 = 0.5 * self.step_length
        else:
            adv0 = self.step_length
        # completed steps before this cycle
        base = self.p0 + jnp.where(
            cycle > 0,
            (jnp.where(self.first_half, 0.5, 1.0)
             + (cycle - 1.0)) * self.step_length,
            jnp.zeros_like(self.step_length))
        adv = jnp.where(cycle > 0, self.step_length, adv0)
        pos = base + phase * adv
        z = self.step_height * jnp.sin(jnp.pi * phase) ** 2
        pos = pos + jnp.array([0.0, 0.0, 1.0], dtype) * z
        active = jnp.where(in_swing, 1.0, 0.0).astype(dtype)
        return pos, active


@struct.dataclass
class PeriodicCoMRef:
    """CoM reference moving at constant velocity during swing phases
    (reference periodic_com_ref.hpp)."""
    com0: jnp.ndarray
    vcom: jnp.ndarray        # (3,) velocity during active spans
    t0: jnp.ndarray
    period_active: jnp.ndarray
    period_inactive: jnp.ndarray
    first_rate: float = struct.field(pytree_node=False, default=1.0)

    def __call__(self, t):
        dtype = self.com0.dtype
        period = self.period_active + self.period_inactive
        tau = t - self.t0
        cycle = jnp.floor(tau / period)
        tin = tau - cycle * period
        act_t = jnp.clip(tin, 0.0, self.period_active)
        total_act = (jnp.maximum(cycle, 0.0) * self.period_active
                     + jnp.where(tau >= 0, act_t, 0.0))
        pos = self.com0 + self.vcom * total_act
        return pos, jnp.asarray(1.0, dtype)


# ---------------------------------------------------------------------------
# Costs
# ---------------------------------------------------------------------------

@struct.dataclass
class TaskSpace3DCost:
    """Frame-position tracking (reference task_space_3d_cost.hpp)."""
    frame_id: int = struct.field(pytree_node=False)
    weight: jnp.ndarray          # (3,)
    weight_terminal: jnp.ndarray
    weight_impact: jnp.ndarray
    ref: object                  # callable pytree: t -> (p_ref, active)

    def _residual(self, model, q, t):
        p = rm.frame_position(model, self.frame_id, q)
        p_ref, active = self.ref(t)
        return (p - p_ref), active

    def _quad(self, model, q, t, w):
        r, active = self._residual(model, q, t)
        J = rm.tangent_jacobian(
            model, q, lambda qq: rm.frame_position(model, self.frame_id, qq))
        wr = active * w * r
        cost = 0.5 * active * jnp.sum(w * r * r)
        lq = J.T @ wr
        Qqq = J.T @ ((active * w)[:, None] * J)
        return cost, lq, Qqq

    def eval_stage(self, model, q, v, a, u, f, t, dt):
        r, active = self._residual(model, q, t)
        return dt * 0.5 * active * jnp.sum(self.weight * r * r)

    def eval_terminal(self, model, q, v, t):
        r, active = self._residual(model, q, t)
        return 0.5 * active * jnp.sum(self.weight_terminal * r * r)

    def eval_impact(self, model, q, v, dv, t):
        r, active = self._residual(model, q, t)
        return 0.5 * active * jnp.sum(self.weight_impact * r * r)

    def quadratize_stage(self, model, nf, q, v, a, u, f, t, dt):
        c, lq, Qqq = self._quad(model, q, t, self.weight)
        out = StageQuad.zeros(model.nv, model.dimu, nf, model.dtype)
        return out._replace(cost=dt * c, lq=dt * lq, Qqq=dt * Qqq)

    def quadratize_terminal(self, model, q, v, t):
        c, lq, Qqq = self._quad(model, q, t, self.weight_terminal)
        out = TerminalQuad.zeros(model.nv, model.dtype)
        return out._replace(cost=c, lq=lq, Qqq=Qqq)

    def quadratize_impact(self, model, q, v, dv, t):
        c, lq, Qqq = self._quad(model, q, t, self.weight_impact)
        out = ImpactQuad.zeros(model.nv, model.dtype)
        return out._replace(cost=c, lq=lq, Qqq=Qqq)


@struct.dataclass
class CoMCost:
    """Center-of-mass tracking (reference com_cost.hpp)."""
    weight: jnp.ndarray
    weight_terminal: jnp.ndarray
    weight_impact: jnp.ndarray
    ref: object

    def _quad(self, model, q, t, w):
        c = rm.com(model, q)
        p_ref, active = self.ref(t)
        r = c - p_ref
        J = rm.tangent_jacobian(model, q, lambda qq: rm.com(model, qq))
        cost = 0.5 * active * jnp.sum(w * r * r)
        lq = J.T @ (active * w * r)
        Qqq = J.T @ ((active * w)[:, None] * J)
        return cost, lq, Qqq

    def eval_stage(self, model, q, v, a, u, f, t, dt):
        return dt * self._quad(model, q, t, self.weight)[0]

    def eval_terminal(self, model, q, v, t):
        return self._quad(model, q, t, self.weight_terminal)[0]

    def eval_impact(self, model, q, v, dv, t):
        return self._quad(model, q, t, self.weight_impact)[0]

    def quadratize_stage(self, model, nf, q, v, a, u, f, t, dt):
        c, lq, Qqq = self._quad(model, q, t, self.weight)
        out = StageQuad.zeros(model.nv, model.dimu, nf, model.dtype)
        return out._replace(cost=dt * c, lq=dt * lq, Qqq=dt * Qqq)

    def quadratize_terminal(self, model, q, v, t):
        c, lq, Qqq = self._quad(model, q, t, self.weight_terminal)
        out = TerminalQuad.zeros(model.nv, model.dtype)
        return out._replace(cost=c, lq=lq, Qqq=Qqq)

    def quadratize_impact(self, model, q, v, dv, t):
        c, lq, Qqq = self._quad(model, q, t, self.weight_impact)
        out = ImpactQuad.zeros(model.nv, model.dtype)
        return out._replace(cost=c, lq=lq, Qqq=Qqq)


@struct.dataclass
class LocalContactForceCost:
    """Quadratic cost on local contact forces (reference
    local_contact_force_cost.hpp); only active contacts contribute."""
    f_weight: jnp.ndarray   # (nf,)
    f_ref: jnp.ndarray      # (nf,)

    def eval_stage(self, model, q, v, a, u, f, t, dt):
        return dt * 0.5 * jnp.sum(self.f_weight * (f - self.f_ref) ** 2)

    def eval_terminal(self, model, q, v, t):
        return jnp.asarray(0.0, model.dtype)

    def eval_impact(self, model, q, v, dv, t):
        return jnp.asarray(0.0, model.dtype)

    def quadratize_stage(self, model, nf, q, v, a, u, f, t, dt):
        out = StageQuad.zeros(model.nv, model.dimu, nf, model.dtype)
        return out._replace(
            cost=self.eval_stage(model, q, v, a, u, f, t, dt),
            lf=dt * self.f_weight * (f - self.f_ref),
            Qff=jnp.diag(dt * self.f_weight))

    def quadratize_terminal(self, model, q, v, t):
        return TerminalQuad.zeros(model.nv, model.dtype)

    def quadratize_impact(self, model, q, v, dv, t):
        return ImpactQuad.zeros(model.nv, model.dtype)


@struct.dataclass
class SE3Ref:
    """Constant SE(3) reference placement."""
    R: jnp.ndarray   # (3, 3)
    p: jnp.ndarray   # (3,)

    def __call__(self, t):
        return (self.R, self.p), jnp.asarray(1.0, self.p.dtype)


@struct.dataclass
class TaskSpace6DCost:
    """Frame SE(3) tracking via the log6 residual
    (reference task_space_6d_cost.hpp: r = log6(M_ref^{-1} M(q)),
    Gauss-Newton over the configuration tangent)."""
    frame_id: int = struct.field(pytree_node=False)
    weight: jnp.ndarray          # (6,) [linear, angular]
    weight_terminal: jnp.ndarray
    weight_impact: jnp.ndarray
    ref: object                  # callable: t -> ((R_ref, p_ref), active)

    def _residual(self, model, q, t):
        from ..ops import lie
        R_w, p_w = rm.forward_kinematics(model, q)
        R, p = rm.frame_placement(model, self.frame_id, R_w, p_w)
        (R_ref, p_ref), active = self.ref(t)
        R_rel = jnp.swapaxes(R_ref, -1, -2) @ R
        p_rel = (jnp.swapaxes(R_ref, -1, -2) @ (p - p_ref)[..., None])[..., 0]
        return lie.se3_log(R_rel, p_rel), active

    def _quad(self, model, q, t, w):
        r, active = self._residual(model, q, t)
        J = rm.tangent_jacobian(
            model, q, lambda qq: self._residual(model, qq, t)[0])
        wr = active * w * r
        cost = 0.5 * active * jnp.sum(w * r * r)
        lq = J.T @ wr
        Qqq = J.T @ ((active * w)[:, None] * J)
        return cost, lq, Qqq

    def eval_stage(self, model, q, v, a, u, f, t, dt):
        r, active = self._residual(model, q, t)
        return dt * 0.5 * active * jnp.sum(self.weight * r * r)

    def eval_terminal(self, model, q, v, t):
        r, active = self._residual(model, q, t)
        return 0.5 * active * jnp.sum(self.weight_terminal * r * r)

    def eval_impact(self, model, q, v, dv, t):
        r, active = self._residual(model, q, t)
        return 0.5 * active * jnp.sum(self.weight_impact * r * r)

    def quadratize_stage(self, model, nf, q, v, a, u, f, t, dt):
        c, lq, Qqq = self._quad(model, q, t, self.weight)
        out = StageQuad.zeros(model.nv, model.dimu, nf, model.dtype)
        return out._replace(cost=dt * c, lq=dt * lq, Qqq=dt * Qqq)

    def quadratize_terminal(self, model, q, v, t):
        c, lq, Qqq = self._quad(model, q, t, self.weight_terminal)
        out = TerminalQuad.zeros(model.nv, model.dtype)
        return out._replace(cost=c, lq=lq, Qqq=Qqq)

    def quadratize_impact(self, model, q, v, dv, t):
        c, lq, Qqq = self._quad(model, q, t, self.weight_impact)
        out = ImpactQuad.zeros(model.nv, model.dtype)
        return out._replace(cost=c, lq=lq, Qqq=Qqq)


@struct.dataclass
class BaseRotationCost:
    """Floating-base orientation tracking vs a time-varying quaternion
    reference (the reference's base-rotation ConfigurationSpaceCost with
    an MPCPeriodicConfigurationRef, mpc_trot.cpp:55-60 +
    mpc_periodic_configuration_ref.cpp). Residual
    r = log3(R_ref(t)^T R_base(q)) on the base-rotation tangent rows;
    Gauss-Newton via a 3-tangent jacfwd (no FK chain needed — the base
    quaternion is read directly from q[3:7])."""
    weight: jnp.ndarray          # (3,)
    weight_terminal: jnp.ndarray
    weight_impact: jnp.ndarray
    ref: object                  # callable: t -> (quat_ref (4,), active)

    def _residual(self, q, t):
        from ..ops import lie
        R = lie.quat_to_rot(q[..., 3:7])
        q_ref, active = self.ref(t)
        R_ref = lie.quat_to_rot(q_ref)
        return lie.so3_log(jnp.swapaxes(R_ref, -1, -2) @ R), active

    def _quad(self, model, q, t, w):
        from ..ops import lie
        r, active = self._residual(q, t)
        R = lie.quat_to_rot(q[3:7])
        q_ref, _ = self.ref(t)
        R_ref = lie.quat_to_rot(q_ref)

        def res_of(phi):
            return lie.so3_log(R_ref.T @ (R @ lie.so3_exp(phi)))

        J3 = jax.jacfwd(res_of)(jnp.zeros(3, q.dtype))     # (3, 3)
        wr = active * w * r
        cost = 0.5 * active * jnp.sum(w * r * r)
        lq = jnp.zeros(model.nv, q.dtype).at[3:6].set(J3.T @ wr)
        Qqq = jnp.zeros((model.nv, model.nv), q.dtype).at[3:6, 3:6].set(
            J3.T @ ((active * w)[:, None] * J3))
        return cost, lq, Qqq

    def eval_stage(self, model, q, v, a, u, f, t, dt):
        r, active = self._residual(q, t)
        return dt * 0.5 * active * jnp.sum(self.weight * r * r)

    def eval_terminal(self, model, q, v, t):
        r, active = self._residual(q, t)
        return 0.5 * active * jnp.sum(self.weight_terminal * r * r)

    def eval_impact(self, model, q, v, dv, t):
        r, active = self._residual(q, t)
        return 0.5 * active * jnp.sum(self.weight_impact * r * r)

    def quadratize_stage(self, model, nf, q, v, a, u, f, t, dt):
        c, lq, Qqq = self._quad(model, q, t, self.weight)
        out = StageQuad.zeros(model.nv, model.dimu, nf, model.dtype)
        return out._replace(cost=dt * c, lq=dt * lq, Qqq=dt * Qqq)

    def quadratize_terminal(self, model, q, v, t):
        c, lq, Qqq = self._quad(model, q, t, self.weight_terminal)
        out = TerminalQuad.zeros(model.nv, model.dtype)
        return out._replace(cost=c, lq=lq, Qqq=Qqq)

    def quadratize_impact(self, model, q, v, dv, t):
        c, lq, Qqq = self._quad(model, q, t, self.weight_impact)
        out = ImpactQuad.zeros(model.nv, model.dtype)
        return out._replace(cost=c, lq=lq, Qqq=Qqq)


# ---------------------------------------------------------------------------
# Fused multi-frame cost (compile-size optimization)
# ---------------------------------------------------------------------------

@struct.dataclass
class MultiFrameTaskCost:
    """All swing-foot position targets + the CoM target in ONE
    forward-kinematics chain and ONE tangent-space jacfwd.

    Functionally equal to (TaskSpace3DCost per foot) + CoMCost — the gait
    MPC's cost stack (reference mpc_trot.cpp:42-81 builds exactly that) —
    but fused: the round-2 graph profile showed five separate FK+jacfwd
    chains dominating the stage kernel's XLA module (29k of 58k HLO lines),
    which in turn dominated the TPU remote-compile budget.

    foot_refs: a STACKED StepSwingFootRef (every leaf with a leading (nc,)
    axis); com_ref: a StepCoMRef."""
    frame_ids: tuple = struct.field(pytree_node=False)
    foot_weight: jnp.ndarray            # (3,)
    foot_weight_terminal: jnp.ndarray
    foot_weight_impact: jnp.ndarray
    com_weight: jnp.ndarray             # (3,)
    com_weight_terminal: jnp.ndarray
    com_weight_impact: jnp.ndarray
    foot_refs: object
    com_ref: object

    def _task(self, model, q):
        R_w, p_w = rm.forward_kinematics(model, q)
        feet = [rm.frame_placement(model, fid, R_w, p_w)[1]
                for fid in self.frame_ids]
        ci = (R_w @ model.com[..., None])[..., 0] + p_w
        com = (jnp.sum(model.mass[:, None] * ci, axis=-2)
               / jnp.sum(model.mass))
        return jnp.concatenate(feet + [com], axis=-1)

    def _ref_active(self, t, dtype):
        p_feet, act_feet = jax.vmap(lambda r: r(t))(self.foot_refs)
        p_com, act_com = self.com_ref(t)
        ref = jnp.concatenate([p_feet.reshape(-1), p_com])
        act = jnp.concatenate(
            [jnp.repeat(act_feet, 3),
             jnp.full(3, act_com, dtype)])
        return ref, act

    def _w(self, w_foot, w_com):
        nc = len(self.frame_ids)
        return jnp.concatenate([jnp.tile(w_foot, nc), w_com])

    def _quad(self, model, q, t, w_foot, w_com):
        task = self._task(model, q)
        ref, act = self._ref_active(t, q.dtype)
        w = self._w(w_foot, w_com) * act
        r = task - ref
        J = rm.tangent_jacobian(model, q,
                                lambda qq: self._task(model, qq))
        wr = w * r
        cost = 0.5 * jnp.sum(w * r * r)
        lq = J.T @ wr
        Qqq = J.T @ (w[:, None] * J)
        return cost, lq, Qqq

    # --- fused-chain fast path (ocp/contact_stage.py) ---
    @property
    def kin_frame_ids(self):
        """Stage kernels that already run a kinematic sweep over these
        frames (+CoM) supply (task, dtask/dq) directly — the cost then
        skips its own FK + jacfwd chain (models/contacts.py
        _task_outputs defines the layout: frames in order, then CoM)."""
        return self.frame_ids

    def _quad_kin(self, t, w_foot, w_com, task, Jq):
        ref, act = self._ref_active(t, task.dtype)
        w = self._w(w_foot, w_com) * act
        r = task - ref
        wr = w * r
        cost = 0.5 * jnp.sum(w * r * r)
        lq = Jq.T @ wr
        Qqq = Jq.T @ (w[:, None] * Jq)
        return cost, lq, Qqq

    def quadratize_stage_kin(self, model, nf, q, v, a, u, f, t, dt,
                             task, Jq):
        c, lq, Qqq = self._quad_kin(t, self.foot_weight, self.com_weight,
                                    task, Jq)
        out = StageQuad.zeros(model.nv, model.dimu, nf, q.dtype)
        return out._replace(cost=dt * c, lq=dt * lq, Qqq=dt * Qqq)

    def quadratize_impact_kin(self, model, q, v, dv, t, task, Jq):
        c, lq, Qqq = self._quad_kin(t, self.foot_weight_impact,
                                    self.com_weight_impact, task, Jq)
        out = ImpactQuad.zeros(model.nv, q.dtype)
        return out._replace(cost=c, lq=lq, Qqq=Qqq)

    # --- component interface (costs/base.py) ---
    def quadratize_stage(self, model, nf, q, v, a, u, f, t, dt):
        c, lq, Qqq = self._quad(model, q, t, self.foot_weight,
                                self.com_weight)
        out = StageQuad.zeros(model.nv, model.dimu, nf, q.dtype)
        return out._replace(cost=dt * c, lq=dt * lq, Qqq=dt * Qqq)

    def quadratize_terminal(self, model, q, v, t):
        c, lq, Qqq = self._quad(model, q, t, self.foot_weight_terminal,
                                self.com_weight_terminal)
        out = TerminalQuad.zeros(model.nv, q.dtype)
        return out._replace(cost=c, lq=lq, Qqq=Qqq)

    def quadratize_impact(self, model, q, v, dv, t):
        c, lq, Qqq = self._quad(model, q, t, self.foot_weight_impact,
                                self.com_weight_impact)
        out = ImpactQuad.zeros(model.nv, q.dtype)
        return out._replace(cost=c, lq=lq, Qqq=Qqq)

    def eval_stage(self, model, q, v, a, u, f, t, dt):
        task = self._task(model, q)
        ref, act = self._ref_active(t, q.dtype)
        w = self._w(self.foot_weight, self.com_weight) * act
        r = task - ref
        return dt * 0.5 * jnp.sum(w * r * r)

    def eval_terminal(self, model, q, v, t):
        task = self._task(model, q)
        ref, act = self._ref_active(t, q.dtype)
        w = self._w(self.foot_weight_terminal,
                    self.com_weight_terminal) * act
        r = task - ref
        return 0.5 * jnp.sum(w * r * r)

    def eval_impact(self, model, q, v, dv, t):
        task = self._task(model, q)
        ref, act = self._ref_active(t, q.dtype)
        w = self._w(self.foot_weight_impact, self.com_weight_impact) * act
        r = task - ref
        return 0.5 * jnp.sum(w * r * r)


# ---------------------------------------------------------------------------
# Discrete-time (per-contact-phase) references for offline STO problems
# (reference discrete_time_swing_foot_ref.cpp:52-78,
#  discrete_time_com_ref.cpp:81-101; used by the reference's
#  examples/anymal/python/{trot_sto1,trot_sto2,bounce}.py)
# ---------------------------------------------------------------------------

@struct.dataclass
class DiscreteTimeSwingFootRef:
    """Swing-foot ref interpolating from the contact position BEFORE the
    swing phase to the one AFTER it, with a triangular height profile of
    apex `step_height` at mid-swing. The reference keys the interpolation
    on (phase, stage_in_phase) from the discretization; here the phase is
    recovered from the grid time against the baked phase boundary times —
    identical on the phase-based STO grid, whose slot times are affine in
    the switching times (sto/discretization.py)."""
    bounds: jnp.ndarray       # (P+1,) phase start times + horizon end
    pos: jnp.ndarray          # (P+1, 3) per-phase contact position (+dup)
    swing: jnp.ndarray        # (P,) 1.0 where the contact swings
    step_height: jnp.ndarray  # scalar
    first_rate: float = struct.field(pytree_node=False, default=1.0)
    last_rate: float = struct.field(pytree_node=False, default=1.0)

    def __call__(self, t):
        dtype = self.pos.dtype
        P = self.swing.shape[0]
        idx = jnp.clip(jnp.sum((t >= self.bounds[1:]).astype(jnp.int32)),
                       0, P - 1)
        lo = jnp.take(self.bounds, idx)
        dur = jnp.maximum(jnp.take(self.bounds, idx + 1) - lo, 1e-8)
        rate = jnp.clip((t - lo) / dur, 0.0, 1.0)
        rate = jnp.where(idx == 0,
                         self.first_rate * (1.0 - rate) + rate, rate)
        rate = jnp.where(idx == P - 1,
                         self.last_rate * (1.0 - rate) + rate, rate)
        p_from = jnp.take(self.pos, jnp.maximum(idx - 1, 0), axis=0)
        p_to = jnp.take(self.pos, idx + 1, axis=0)
        ref = (1.0 - rate) * p_from + rate * p_to
        z = jnp.where(rate < 0.5, 2.0 * rate, 2.0 * (1.0 - rate)) \
            * self.step_height
        ref = ref + jnp.array([0.0, 0.0, 1.0], dtype) * z
        return ref, jnp.take(self.swing, idx).astype(dtype)


@struct.dataclass
class DiscreteTimeCoMRef:
    """CoM ref per contact phase: the average of the active contacts'
    implied CoM positions (placement_i - com_to_contact_i), interpolated
    across phases that have swinging contacts and held constant during
    full stance (reference discrete_time_com_ref.cpp:81-101)."""
    bounds: jnp.ndarray        # (P+1,)
    com: jnp.ndarray           # (P+1, 3) per-phase CoM anchors (+dup)
    has_inactive: jnp.ndarray  # (P,) 1.0 where some contact swings
    first_rate: float = struct.field(pytree_node=False, default=1.0)
    last_rate: float = struct.field(pytree_node=False, default=1.0)

    def __call__(self, t):
        dtype = self.com.dtype
        P = self.has_inactive.shape[0]
        idx = jnp.clip(jnp.sum((t >= self.bounds[1:]).astype(jnp.int32)),
                       0, P - 1)
        lo = jnp.take(self.bounds, idx)
        dur = jnp.maximum(jnp.take(self.bounds, idx + 1) - lo, 1e-8)
        rate = jnp.clip((t - lo) / dur, 0.0, 1.0)
        rate = jnp.where(idx == 0,
                         self.first_rate * (1.0 - rate) + rate, rate)
        rate = jnp.where(idx == P - 1,
                         self.last_rate * (1.0 - rate) + rate, rate)
        c_here = jnp.take(self.com, idx, axis=0)
        c_next = jnp.take(self.com, idx + 1, axis=0)
        moving = jnp.take(self.has_inactive, idx)
        ref = jnp.where(moving > 0,
                        (1.0 - rate) * c_here + rate * c_next, c_here)
        return ref, jnp.asarray(1.0, dtype)


def make_discrete_time_swing_refs(schedule, t_end, step_height, dtype):
    """Bake one DiscreteTimeSwingFootRef per contact from a
    ContactSchedule (the reference's setSwingFootRef(contact_sequence),
    discrete_time_swing_foot_ref.cpp:22-35)."""
    import numpy as np
    bounds = np.array([ph.start_time for ph in schedule.phases]
                      + [float(t_end)])
    refs = []
    for i in range(schedule.nc):
        pos = np.array([ph.placements[i] for ph in schedule.phases])
        pos = np.vstack([pos, pos[-1:]])
        swing = np.array([0.0 if ph.active[i] else 1.0
                          for ph in schedule.phases])
        refs.append(DiscreteTimeSwingFootRef(
            bounds=jnp.asarray(bounds, dtype),
            pos=jnp.asarray(pos, dtype),
            swing=jnp.asarray(swing, dtype),
            step_height=jnp.asarray(step_height, dtype)))
    return refs


def make_discrete_time_com_ref(schedule, t_end, com_to_contact, dtype):
    """Bake a DiscreteTimeCoMRef from a ContactSchedule: per-phase CoM
    anchor = mean over active contacts of (placement - com_to_contact),
    with the reference's flying-phase midpoint smoothing
    (discrete_time_com_ref.cpp:23-52)."""
    import numpy as np
    bounds = np.array([ph.start_time for ph in schedule.phases]
                      + [float(t_end)])
    com_to_contact = np.asarray(com_to_contact, float)
    coms, has_inactive = [], []
    prev_had_active = True
    for p, ph in enumerate(schedule.phases):
        act = np.asarray(ph.active, bool)
        n_act = int(act.sum())
        if n_act > 0:
            c = (ph.placements[act] - com_to_contact[act]).mean(axis=0)
        else:
            c = np.zeros(3)
        coms.append(c)
        has_inactive.append(1.0 if n_act < schedule.nc else 0.0)
        if not prev_had_active and p > 1:
            coms[p - 1] = 0.5 * (coms[p - 2] + coms[p])
        prev_had_active = n_act > 0
    coms.append(coms[-1])
    return DiscreteTimeCoMRef(
        bounds=jnp.asarray(bounds, dtype),
        com=jnp.asarray(np.array(coms), dtype),
        has_inactive=jnp.asarray(np.array(has_inactive), dtype))
