"""Contact schedule (host-side) -> static-shape per-grid arrays.

Re-expression of the reference's ContactSequence + TimeDiscretization
(reference: include/robotoc/planner/contact_sequence.hpp:23,
src/ocp/time_discretization.cpp:43) for the static-shape TPU pipeline:
the schedule is host-side Python/numpy; `discretize` bakes it into a
GridData pytree of arrays (masks / placements / dts) consumed by the jitted
solver — gait changes alter VALUES, never shapes, so the solver never
recompiles as the contact sequence slides forward in MPC.

v1 grid layout: N+1 uniform grids; a discrete event (impact/lift) occurring
inside interval i marks grid i+1 with the post-event status and flags the
event grid (impact handling lands with the impact stage).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np
from flax import struct

import jax.numpy as jnp


@dataclasses.dataclass
class ContactPhase:
    active: np.ndarray            # (nc,) bool
    placements: np.ndarray        # (nc, 3) world contact position refs
    friction: np.ndarray          # (nc,)
    start_time: float


class ContactSchedule:
    """Deque-like phase list (reference contact_sequence.hpp:69-111)."""

    def __init__(self, nc: int, default_friction: float = 0.7):
        self.nc = nc
        self.default_friction = default_friction
        self.phases: List[ContactPhase] = []
        self.event_is_impact: List[bool] = []   # between phase i and i+1

    def init(self, active, placements, friction=None, t0: float = 0.0):
        self.phases = [ContactPhase(
            np.asarray(active, bool), np.asarray(placements, float),
            np.full(self.nc, self.default_friction)
            if friction is None else np.asarray(friction, float), t0)]
        self.event_is_impact = []
        return self

    def push_back(self, active, placements, time: float, friction=None):
        prev = self.phases[-1]
        active = np.asarray(active, bool)
        was = prev.active
        is_impact = bool(np.any(active & ~was))
        self.phases.append(ContactPhase(
            active, np.asarray(placements, float),
            np.full(self.nc, self.default_friction)
            if friction is None else np.asarray(friction, float), time))
        self.event_is_impact.append(is_impact)

    def pop_front(self):
        if len(self.phases) > 1:
            self.phases.pop(0)
            self.event_is_impact.pop(0)

    def phase_at(self, t: float) -> ContactPhase:
        ph = self.phases[0]
        for p in self.phases[1:]:
            if t >= p.start_time:
                ph = p
            else:
                break
        return ph


@struct.dataclass
class GridData:
    """Per-grid arrays consumed by the jitted stage pipeline."""
    dt: jnp.ndarray            # (N,)
    t: jnp.ndarray             # (N+1,)
    contact_mask: jnp.ndarray  # (N+1, nc) 1.0/0.0
    p_ref: jnp.ndarray         # (N+1, nc, 3)
    friction: jnp.ndarray      # (N+1, nc)
    impact_mask: jnp.ndarray   # (N+1,) 1.0 where an impact event grid


def discretize(schedule: ContactSchedule, t0: float, T: float, N: int,
               dtype=jnp.float64) -> GridData:
    dt = T / N
    ts = t0 + dt * np.arange(N + 1)
    mask = np.zeros((N + 1, schedule.nc))
    p_ref = np.zeros((N + 1, schedule.nc, 3))
    fric = np.zeros((N + 1, schedule.nc))
    impact = np.zeros(N + 1)
    for i, t in enumerate(ts):
        ph = schedule.phase_at(t + 1e-12)
        mask[i] = ph.active.astype(float)
        p_ref[i] = ph.placements
        fric[i] = ph.friction
    # flag grids right after an impact event
    for k, p in enumerate(schedule.phases[1:]):
        if schedule.event_is_impact[k] and t0 <= p.start_time <= t0 + T:
            idx = int(np.ceil((p.start_time - t0) / dt - 1e-12))
            if 0 <= idx <= N:
                impact[idx] = 1.0
    arr = lambda x: jnp.asarray(x, dtype)
    return GridData(dt=arr(np.full(N, dt)), t=arr(ts),
                    contact_mask=arr(mask), p_ref=arr(p_ref),
                    friction=arr(fric), impact_mask=arr(impact))
