"""Phase-based time discretization for switching-time optimization.

Re-expression of the reference's PhaseBased discretization
(reference: src/ocp/time_discretization.cpp:43-..., correctTimeSteps at
include/robotoc/ocp/time_discretization.hpp:155): within each contact phase
the grids are uniform, so every grid time / time step is a LINEAR function of
the phase boundary vector b = [t0, ts_1, ..., ts_E, t0+T]:

    t  = Wt @ b        (S,)      dt = Wd @ b     (S-1,)

with Wt/Wd static matrices baked at discretization time. The jitted STO
update therefore takes the switching times ts as a traced ARRAY input —
moving the switching times never recompiles, and d(t, dt)/d(ts) is exact
under autodiff. Impact events own a dedicated zero-duration slot at the
phase boundary (same slot convention as planner/contact_sequence.py).

Mesh refinement (reference ocp_solver.cpp:184-199) = re-allocating the
per-phase grid counts from the CURRENT switching times and rebuilding Wt/Wd
(a shape change -> one recompile, exactly like the reference's
re-discretization).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax.numpy as jnp

from ..planner.contact_sequence import ContactSchedule, GridData


def allocate_grids(dwell: Sequence[float], N: int) -> list:
    """Split N grids over phases proportionally to dwell times, >=1 each
    (the static analog of the reference's event-grid insertion followed by
    correctTimeSteps)."""
    dwell = np.asarray(dwell, float)
    P = len(dwell)
    if N < P:
        raise ValueError(f"need at least {P} grids for {P} phases")
    raw = dwell / dwell.sum() * N
    counts = np.maximum(1, np.floor(raw).astype(int))
    # distribute the remainder to the phases with the largest fractional part
    while counts.sum() < N:
        frac = raw - counts
        counts[int(np.argmax(frac))] += 1
        raw = counts + 0.0  # freeze: further remainders round-robin largest
    while counts.sum() > N:
        i = int(np.argmax(counts))
        counts[i] -= 1
    return [int(c) for c in counts]


class PhaseDiscretization:
    """Static slot layout + (Wt, Wd) for a phase-based grid.

    Slots: for phase p with Np grids -> Np intermediate slots; an impact
    event between phase p and p+1 adds one zero-dt impact slot at the
    boundary; one terminal slot at t0+T. Values of the boundary vector move
    (STO); the layout never does.
    """

    def __init__(self, schedule: ContactSchedule, t0: float, T: float,
                 N: int, dtype=jnp.float64,
                 grids_per_phase: Optional[Sequence[int]] = None):
        self.schedule = schedule
        self.t0, self.T, self.N = float(t0), float(T), int(N)
        self.dtype = dtype
        nc = schedule.nc

        # phases overlapping [t0, t0+T]; events strictly inside
        phases = []          # indices into schedule.phases
        events = []          # (schedule event idx, time, is_impact)
        for k, ph in enumerate(schedule.phases):
            t_start = ph.start_time
            t_end = (schedule.phases[k + 1].start_time
                     if k + 1 < len(schedule.phases) else np.inf)
            if t_end <= t0 + 1e-12 or t_start >= t0 + T - 1e-12:
                continue
            phases.append(k)
        for j in range(len(phases) - 1):
            k = phases[j]
            te = schedule.phases[k + 1].start_time
            events.append((k, te, schedule.event_is_impact[k]))
        self.P = len(phases)                      # number of phases
        self.E = len(events)                      # number of switching times
        self.phase_indices = phases
        self.event_is_impact = tuple(bool(e[2]) for e in events)
        sto_flags = list(getattr(schedule, "event_sto", []) or [])
        self.event_sto = tuple(
            bool(sto_flags[e[0]]) if e[0] < len(sto_flags) else True
            for e in events)
        self.ts0 = np.asarray([e[1] for e in events], float)
        self.n_impact_slots = int(sum(1 for e in self.event_is_impact if e))

        b0 = np.concatenate([[t0], self.ts0, [t0 + T]])
        dwell0 = np.diff(b0)
        if grids_per_phase is None:
            grids_per_phase = allocate_grids(dwell0, N)
        self.grids_per_phase = tuple(int(g) for g in grids_per_phase)
        assert len(self.grids_per_phase) == self.P

        # ---- build static slot arrays + Wt/Wd --------------------------
        rows_mask, rows_pref, rows_fric = [], [], []
        rows_isimp, rows_impmask, rows_Rref = [], [], []
        Wt_rows, Wd_rows = [], []
        nb = self.P + 1

        def brow(p, w_lo, w_hi):
            r = np.zeros(nb)
            r[p] += w_lo
            r[p + 1] += w_hi
            return r

        self._event_slot = []      # slot index of each event's boundary grid
        for j, p in enumerate(phases):
            ph = schedule.phases[p]
            Np = self.grids_per_phase[j]
            for g in range(Np):
                frac = g / Np
                Wt_rows.append(brow(j, 1.0 - frac, frac))
                Wd_rows.append(brow(j, -1.0 / Np, 1.0 / Np))
                rows_mask.append(ph.active.astype(float))
                rows_pref.append(ph.placements)
                rows_fric.append(ph.friction)
                rows_isimp.append(0.0)
                rows_impmask.append(np.zeros(nc))
                rows_Rref.append(ph.rotations)
            if j < self.P - 1:
                nxt = schedule.phases[phases[j + 1]]
                self._event_slot.append(len(Wt_rows))
                if events[j][2]:                  # impact slot at boundary
                    Wt_rows.append(brow(j, 0.0, 1.0))
                    Wd_rows.append(np.zeros(nb))
                    rows_mask.append(nxt.active.astype(float))
                    rows_pref.append(nxt.placements)
                    rows_fric.append(nxt.friction)
                    rows_isimp.append(1.0)
                    rows_impmask.append(
                        (nxt.active & ~ph.active).astype(float))
                    rows_Rref.append(nxt.rotations)
        # terminal slot
        last = schedule.phases[phases[-1]]
        Wt_rows.append(brow(self.P - 1, 0.0, 1.0))
        rows_mask.append(last.active.astype(float))
        rows_pref.append(last.placements)
        rows_fric.append(last.friction)
        rows_isimp.append(0.0)
        rows_impmask.append(np.zeros(nc))
        rows_Rref.append(last.rotations)

        self.n_slots = len(Wt_rows)
        arr = lambda x: jnp.asarray(np.asarray(x), dtype)
        self.Wt = arr(np.stack(Wt_rows))
        self.Wd = arr(np.stack(Wd_rows))
        self._contact_mask = arr(np.stack(rows_mask))
        self._p_ref = arr(np.stack(rows_pref))
        self._friction = arr(np.stack(rows_fric))
        self._is_impact = arr(rows_isimp)
        self._imp_mask = arr(np.stack(rows_impmask))
        self._R_ref = arr(np.stack(rows_Rref))
        self.sto_mask = jnp.asarray(
            np.asarray(self.event_sto, float), dtype)

    # ---- jit-safe -------------------------------------------------------
    def boundaries(self, ts):
        c = lambda x: jnp.asarray(x, self.dtype).reshape(-1)
        return jnp.concatenate([c(self.t0), jnp.asarray(ts, self.dtype),
                                c(self.t0 + self.T)])

    def grid(self, ts) -> GridData:
        """GridData as a function of the switching times (traced)."""
        b = self.boundaries(ts)
        return GridData(dt=self.Wd @ b, t=self.Wt @ b,
                        contact_mask=self._contact_mask,
                        p_ref=self._p_ref, friction=self._friction,
                        is_impact=self._is_impact, imp_mask=self._imp_mask,
                        R_ref=self._R_ref)

    # ---- host-side ------------------------------------------------------
    def dwell_times(self, ts) -> np.ndarray:
        return np.diff(np.concatenate(
            [[self.t0], np.asarray(ts, float), [self.t0 + self.T]]))

    def max_time_step(self, ts) -> float:
        dw = self.dwell_times(ts)
        return float(np.max(dw / np.asarray(self.grids_per_phase)))

    def refine(self, ts) -> "PhaseDiscretization":
        """Re-allocate grids per phase from the current switching times
        (reference correctTimeSteps + re-discretize on mesh refinement)."""
        sched = _schedule_with_times(self.schedule, self.phase_indices, ts)
        return PhaseDiscretization(sched, self.t0, self.T, self.N,
                                   dtype=self.dtype)


def _schedule_with_times(schedule: ContactSchedule, phase_indices, ts):
    """Clone the schedule with updated event times for the horizon events
    (reference ContactSequence::setImpactTime/setLiftTime,
    contact_sequence.hpp:119-127)."""
    import copy
    out = copy.deepcopy(schedule)
    for j in range(len(phase_indices) - 1):
        k = phase_indices[j]
        out.phases[k + 1].start_time = float(np.asarray(ts)[j])
    return out
