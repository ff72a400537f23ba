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

_BAKER_WARNED = False


@dataclasses.dataclass
class ContactPhase:
    active: np.ndarray            # (nc,) bool
    placements: np.ndarray        # (nc, 3) world contact position refs
    friction: np.ndarray          # (nc,)
    start_time: float
    rotations: Optional[np.ndarray] = None   # (nc, 3, 3) surface rotations

    def __post_init__(self):
        if self.rotations is None:
            self.rotations = np.broadcast_to(
                np.eye(3), (len(self.active), 3, 3)).copy()


class ContactSchedule:
    """Deque-like phase list (reference contact_sequence.hpp:69-111)."""

    def __init__(self, nc: int, default_friction: float = 0.7):
        self.nc = nc
        self.default_friction = default_friction
        self.phases: List[ContactPhase] = []
        self.event_is_impact: List[bool] = []   # between phase i and i+1
        self.event_sto: List[bool] = []         # optimize this event's time?

    def init(self, active, placements, friction=None, t0: float = 0.0,
             rotations=None):
        self.phases = [ContactPhase(
            np.asarray(active, bool), np.asarray(placements, float),
            np.full(self.nc, self.default_friction)
            if friction is None else np.asarray(friction, float), t0,
            rotations)]
        self.event_is_impact = []
        self.event_sto = []
        return self

    def push_back(self, active, placements, time: float, friction=None,
                  sto: bool = False, rotations=None):
        """Append a phase; `sto` marks the transition time as a decision
        variable for switching-time optimization (reference
        contact_sequence.hpp:82-99 push_back(..., sto))."""
        prev = self.phases[-1]
        active = np.asarray(active, bool)
        was = prev.active
        is_impact = bool(np.any(active & ~was))
        self.phases.append(ContactPhase(
            active, np.asarray(placements, float),
            np.full(self.nc, self.default_friction)
            if friction is None else np.asarray(friction, float), time,
            rotations))
        self.event_is_impact.append(is_impact)
        self.event_sto.append(bool(sto))

    def pop_front(self):
        if len(self.phases) > 1:
            self.phases.pop(0)
            self.event_is_impact.pop(0)
            if self.event_sto:
                self.event_sto.pop(0)

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
    """Per-slot arrays consumed by the jitted stage pipeline.

    S = N + 1 + n_reserved slots; the last slot is terminal. Impact events
    occupy reserved slots (dt = 0, is_impact = 1); unused reserved slots are
    identity pass-throughs (is_impact = 1, empty imp_mask) — a STATIC slot
    count absorbs a varying number of events (vs the reference's dynamic
    grid insertion, time_discretization.cpp:44)."""
    dt: jnp.ndarray            # (S-1,) step to the next slot (0 at impacts)
    t: jnp.ndarray             # (S,)
    contact_mask: jnp.ndarray  # (S, nc) 1.0/0.0
    p_ref: jnp.ndarray         # (S, nc, 3)
    friction: jnp.ndarray      # (S, nc)
    is_impact: jnp.ndarray     # (S,) 1.0 on impact/pass-through slots
    imp_mask: jnp.ndarray      # (S, nc) newly-active contacts at the slot
    R_ref: jnp.ndarray         # (S, nc, 3, 3) surface-contact rotation refs

    @property
    def n_slots(self):
        return self.t.shape[-1]


def discretize(schedule: ContactSchedule, t0: float, T: float, N: int,
               n_reserved: int = 0, dtype=jnp.float64,
               use_native: bool = True) -> GridData:
    """Build the slot arrays with EXACT event alignment: the uniform grid
    boundary nearest each discrete event is snapped to the exact event time
    (non-uniform per-slot dt; values change, shapes never) — the static-shape
    analog of the reference's event-grid insertion
    (time_discretization.cpp:43-90). At MPC control rate the baking runs in
    native C++ (robotoc_tpu/native, the reference's TimeDiscretization
    analog); the Python path below is the oracle and fallback."""
    if use_native:
        from .. import native as _native
        out = None
        try:
            out = _native.bake_grid(schedule, t0, T, N, n_reserved)
        except ValueError:
            raise
        except Exception as e:  # noqa: BLE001 - degrade to the Python path
            global _BAKER_WARNED
            if not _BAKER_WARNED:
                _BAKER_WARNED = True
                import warnings
                warnings.warn(
                    "native grid baker failed; falling back to the Python "
                    f"path for this process: {type(e).__name__}: {e}",
                    RuntimeWarning, stacklevel=2)
            out = None
        if out is not None:
            (t, dtv, cm, pr, fr, ii, im, Rr) = out
            arr = lambda x: jnp.asarray(x, dtype)
            return GridData(dt=arr(dtv[:N + n_reserved]), t=arr(t),
                            contact_mask=arr(cm), p_ref=arr(pr),
                            friction=arr(fr), is_impact=arr(ii),
                            imp_mask=arr(im), R_ref=arr(Rr))
    dt = T / N
    nc = schedule.nc
    bounds = t0 + dt * np.arange(N + 1)
    # all events (impact or lift) inside the horizon, with snap targets
    impacts = {}     # boundary index -> newly-active mask
    for k, p in enumerate(schedule.phases[1:]):
        te = p.start_time
        if t0 < te <= t0 + T + 1e-9:
            b = int(round((te - t0) / dt))
            b = min(max(b, 1), N)
            bounds[b] = te
            prev = schedule.phases[k].active
            newly = p.active & ~prev
            if schedule.event_is_impact[k]:
                impacts[b] = impacts.get(b, np.zeros(nc, bool)) | newly
    bounds = np.maximum.accumulate(bounds)   # keep monotone
    n_impacts = len(impacts)
    if n_impacts > n_reserved:
        raise ValueError(
            f"{n_impacts} impact events in horizon but only "
            f"{n_reserved} reserved slots")

    rows = []   # (t, dt, active, p_ref, fric, is_impact, imp_mask, R_ref)

    def status(t):
        ph = schedule.phase_at(t + 1e-9)
        return (ph.active.astype(float), ph.placements, ph.friction,
                ph.rotations)

    for k in range(N):
        tk, tk1 = bounds[k], bounds[k + 1]
        if k in impacts:
            a, p, f, R = status(tk)
            rows.append((tk, 0.0, a, p, f, 1.0, impacts[k].astype(float),
                         R))
        a, p, f, R = status(tk)
        rows.append((tk, tk1 - tk, a, p, f, 0.0, np.zeros(nc), R))
    # unused reserved slots: identity pass-throughs before terminal
    t_end = bounds[N]
    for _ in range(n_reserved - n_impacts):
        a, p, f, R = status(t_end)
        rows.append((t_end, 0.0, a, p, f, 1.0, np.zeros(nc), R))
    if N in impacts:
        a, p, f, R = status(t_end)
        rows.append((t_end, 0.0, a, p, f, 1.0, impacts[N].astype(float),
                     R))
    a, p, f, R = status(t_end)
    rows.append((t_end, 0.0, a, p, f, 0.0, np.zeros(nc), R))  # terminal

    arr = lambda x: jnp.asarray(np.asarray(x), dtype)
    return GridData(
        dt=arr([r[1] for r in rows[:-1]]),
        t=arr([r[0] for r in rows]),
        contact_mask=arr([r[2] for r in rows]),
        p_ref=arr([r[3] for r in rows]),
        friction=arr([r[4] for r in rows]),
        is_impact=arr([r[5] for r in rows]),
        imp_mask=arr([r[6] for r in rows]),
        R_ref=arr([r[7] for r in rows]))
