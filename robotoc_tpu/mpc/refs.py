"""Jit-safe step-indexed MPC references (planner-synchronized).

Re-expression of the reference's MPCPeriodicSwingFootRef / MPCPeriodicCoMRef
(reference: src/mpc/mpc_periodic_swing_foot_ref.cpp,
mpc_periodic_com_ref.cpp): instead of virtual update_ref objects, these are
pytree components holding per-step ARRAYS (static K slots) that the MPC layer
refreshes each update — values change, shapes don't, so the jitted solver
never recompiles.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class StepSwingFootRef:
    """Swing trajectory for ONE foot across its K planned swings: linear
    x/y advance from x_prev[k] to x_next[k] plus a sin^2 height bell."""
    x_prev: jnp.ndarray      # (K, 3)
    x_next: jnp.ndarray      # (K, 3)
    t_start: jnp.ndarray     # (K,) swing start times (sorted)
    swing_time: jnp.ndarray  # scalar or (K,) per-swing duration
    step_height: jnp.ndarray
    valid: jnp.ndarray       # (K,) 1.0 where the slot holds a real swing

    def __call__(self, t):
        k = jnp.clip(jnp.searchsorted(self.t_start, t, side="right") - 1,
                     0, self.t_start.shape[0] - 1)
        tau = t - self.t_start[k]
        dur = self.swing_time[k] if self.swing_time.ndim else \
            self.swing_time
        in_swing = (tau >= 0.0) & (tau <= dur) & \
            (self.valid[k] > 0)
        phase = jnp.clip(tau / dur, 0.0, 1.0)
        pos = self.x_prev[k] + phase * (self.x_next[k] - self.x_prev[k])
        # triangular height ramp (reference mpc_periodic_swing_foot_ref
        # .cpp:100-105)
        z = self.step_height * jnp.where(phase < 0.5, 2.0 * phase,
                                         2.0 * (1.0 - phase))
        pos = pos.at[2].add(z)
        return pos, jnp.where(in_swing, 1.0, 0.0).astype(pos.dtype)


def _slerp(q0, q1, s):
    """Quaternion slerp with shortest-arc sign correction, (x,y,z,w)."""
    dot = jnp.sum(q0 * q1, axis=-1)
    q1 = jnp.where(dot < 0.0, -q1, q1)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(dot)
    sin_t = jnp.sin(theta)
    small = sin_t < 1e-6
    w0 = jnp.where(small, 1.0 - s, jnp.sin((1.0 - s) * theta)
                   / jnp.where(small, 1.0, sin_t))
    w1 = jnp.where(small, s, jnp.sin(s * theta)
                   / jnp.where(small, 1.0, sin_t))
    q = w0 * q0 + w1 * q1
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


@struct.dataclass
class StepBaseRotRef:
    """Base-orientation reference slerping between the planner's per-step
    yaw rotations during swing windows
    (reference mpc/mpc_periodic_configuration_ref.cpp:95-110: q_ref's
    quaternion block = slerp(quat[phase], quat[phase+1], rate))."""
    quat_steps: jnp.ndarray   # (K+1, 4) base quaternion after k steps
    t_start: jnp.ndarray      # (K,) swing start times (sorted)
    swing_time: jnp.ndarray   # scalar: active period
    valid: jnp.ndarray        # (K,)

    def __call__(self, t):
        K = self.t_start.shape[0]
        k = jnp.clip(jnp.searchsorted(self.t_start, t, side="right") - 1,
                     0, K - 1)
        tau = t - self.t_start[k]
        rate = jnp.clip(tau / self.swing_time, 0.0, 1.0)
        before_first = t < self.t_start[0]
        q = _slerp(self.quat_steps[k], self.quat_steps[k + 1],
                   jnp.where(self.valid[k] > 0, rate, 0.0))
        return jnp.where(before_first, self.quat_steps[0], q), \
            jnp.asarray(1.0, q.dtype)


@struct.dataclass
class StepConfigurationRef:
    """Full-configuration time-varying reference, synchronized with the
    planner's steps: q_ref(t) equals the nominal configuration `q` with
    the base-quaternion block q[3:7] slerped between the per-step yaw
    rotations during each swing window (the reference's
    MPCPeriodicConfigurationRef, mpc_periodic_configuration_ref.cpp:95-110:
    q_ref = q_; q_ref.segment<4>(3) = quat[phase].slerp(rate,
    quat[phase+1])). Plug into ConfigurationSpaceCost.q_ref_fn."""
    q: jnp.ndarray            # (nq,) nominal configuration
    quat_steps: jnp.ndarray   # (K+1, 4) base quaternion after k steps
    t_start: jnp.ndarray      # (K,) swing start times (sorted)
    swing_time: jnp.ndarray   # scalar: active period
    valid: jnp.ndarray        # (K,)

    def __call__(self, t):
        quat, _ = StepBaseRotRef(self.quat_steps, self.t_start,
                                 self.swing_time, self.valid)(t)
        return self.q.at[3:7].set(quat)


@struct.dataclass
class StepCoMRef:
    """CoM reference interpolating planner step CoMs: lerp during each swing
    window, hold otherwise."""
    com_steps: jnp.ndarray   # (K+1, 3) CoM after k steps (0 = current)
    t_start: jnp.ndarray     # (K,) swing start times
    swing_time: jnp.ndarray
    valid: jnp.ndarray       # (K,)

    def __call__(self, t):
        K = self.t_start.shape[0]
        k = jnp.clip(jnp.searchsorted(self.t_start, t, side="right") - 1,
                     0, K - 1)
        tau = t - self.t_start[k]
        phase = jnp.clip(tau / self.swing_time, 0.0, 1.0)
        before_first = t < self.t_start[0]
        base = self.com_steps[k]
        target = self.com_steps[k + 1]
        pos = jnp.where(before_first, self.com_steps[0],
                        base + phase * (target - base))
        active = jnp.where(self.valid[k] > 0, 1.0, 1.0)
        return pos, jnp.asarray(1.0, pos.dtype)
