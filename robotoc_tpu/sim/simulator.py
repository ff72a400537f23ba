"""Closed-loop simulation harness: forward dynamics + penalty ground contact.

Counterpart of the reference's robotoc_sim package
(reference: bindings/python/robotoc_sim/legged_simulator.py:63-225,
mpc_simulation.py:13-86). PyBullet is not available in this environment, so
the plant is self-contained: forward dynamics from the same rigid-body model
(M a = tau + J^T f_ext - h) with a spring-damper (penalty) ground contact and
Coulomb friction cap — deliberately a DIFFERENT contact model from the
solver's rigid-contact assumption, so closed-loop MPC tests exercise genuine
model mismatch like a physics engine would.

The whole simulator step is jitted; an MPC-in-the-loop run logs
(q, v, u, kkt) per control step like the reference's MPCSimulation.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models import contacts as ct
from ..models import robot as rm


class SimState(NamedTuple):
    q: jnp.ndarray
    v: jnp.ndarray
    t: jnp.ndarray


class LeggedSimulator:
    """Semi-implicit Euler at `sim_dt`, torque-controlled."""

    def __init__(self, model: rm.RobotModel, contacts: ct.ContactModel,
                 sim_dt: float = 2e-4, ground_z: float = 0.0,
                 kp: float = 2e4, kd: float = 200.0, mu: float = 0.7,
                 kt: float = 300.0, terrain=None):
        """terrain: optional jnp-traceable height map z = terrain(x, y)
        replacing the flat ground at ground_z (the TPU-native analog of
        the reference's PyBullet heightfield terrain,
        robotoc_sim/legged_simulator.py:16-54)."""
        self.model = model
        self.contacts = contacts
        self.sim_dt = float(sim_dt)
        self.terrain = terrain
        self.params = (float(ground_z), float(kp), float(kd), float(mu),
                       float(kt))
        self._step = jax.jit(functools.partial(
            _sim_step, model, contacts, self.sim_dt, *self.params,
            terrain=terrain))

    def init(self, q, v, t=0.0) -> SimState:
        dtype = self.model.dtype
        return SimState(jnp.asarray(q, dtype), jnp.asarray(v, dtype),
                        jnp.asarray(t, dtype))

    def step(self, state: SimState, u, n_substeps: int = 1) -> SimState:
        for _ in range(n_substeps):
            state = self._step(state, jnp.asarray(u, self.model.dtype))
        return state


def _contact_forces(model, contacts, ground_z, kp, kd, mu, kt, q, v,
                    terrain=None):
    """Per-contact LOCAL frame force from the penalty ground model."""
    R_w, p_w = rm.forward_kinematics(model, q)
    vs = rm.joint_velocities(model, q, v)
    forces = []
    for c in range(contacts.n_contacts):
        fid = contacts.frame_ids[c]
        par = model.frame_parents[fid]
        fR, fp = model.frame_R[fid], model.frame_p[fid]
        Rf = R_w[..., par, :, :] @ fR
        pf = (R_w[..., par, :, :] @ fp[..., None])[..., 0] + p_w[..., par, :]
        from ..ops.spatial import motion_transform_inv
        vf_local = motion_transform_inv(fR, fp, vs[..., par, :])
        v_world = (Rf @ vf_local[..., :3, None])[..., 0]
        gz = ground_z if terrain is None else terrain(pf[..., 0],
                                                      pf[..., 1])
        pen = gz - pf[..., 2]
        in_contact = pen > 0.0
        # spring-damper normal force; the damper acts in BOTH directions
        # while in contact (a one-sided damper leaves the rebound
        # undamped — the standing robot then bounces elastically and the
        # rigid-contact MPC pumps the oscillation)
        fn = jnp.where(in_contact,
                       kp * pen - kd * v_world[..., 2], 0.0)
        fn = jnp.maximum(fn, 0.0)
        vt = v_world[..., :2]
        vt_norm = jnp.linalg.norm(vt, axis=-1) + 1e-8
        ft_mag = jnp.minimum(mu * fn, kt * vt_norm)
        ft = -ft_mag[..., None] * vt / vt_norm[..., None]
        f_world = jnp.concatenate(
            [ft, fn[..., None]], axis=-1)
        f_local = (jnp.swapaxes(Rf, -1, -2) @ f_world[..., None])[..., 0]
        forces.append(f_local)
    return jnp.concatenate(forces, axis=-1)


def _sim_step(model, contacts, dt, ground_z, kp, kd, mu, kt,
              state: SimState, u, terrain=None):
    q, v, t = state
    f_stack = _contact_forces(model, contacts, ground_z, kp, kd, mu, kt,
                              q, v, terrain=terrain)
    f_joint = ct.contact_forces_to_joint(model, contacts, f_stack)
    tau = jnp.concatenate([jnp.zeros(model.dim_passive, q.dtype), u])
    # M a = tau + (contact forces) - h(q, v)
    h = rm.rnea(model, q, v, jnp.zeros_like(v), f_joint)
    M = rm.crba(model, q)
    a = jnp.linalg.solve(M, tau - h)
    v_new = v + dt * a
    q_new = rm.integrate(model, q, dt * v_new)
    return SimState(rm.normalize(model, q_new), v_new, t + dt)
