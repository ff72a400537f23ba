"""MPC-in-simulation driver: the de-facto end-to-end regression harness.

Counterpart of the reference's MPCSimulation
(reference: bindings/python/robotoc_sim/mpc_simulation.py:13-86): run an
MPC controller against the plant (sim/simulator.py LeggedSimulator — a
penalty-contact forward-dynamics model deliberately different from the
solver's rigid-contact assumption), with

  * `simulation_steps_per_mpc_update`: control runs slower than the sim;
  * `feedback_policy`: between MPC updates apply the interpolated LQR
    PD+feedforward policy (mpc/control_policy.py) instead of holding u0;
  * `feedback_delay`: compute u from the PREVIOUS solution before the
    MPC update of this tick (one-tick computation delay, reference
    mpc_simulation.py:44-50);
  * in-memory logs of (t, q, v, u, kkt) per control step.

The MPC object must provide `update_solution(t, dt, q, v) -> kkt`,
`get_initial_control_input()`, `get_control_policy(t)` and (optionally)
`kkt_error(t, q, v)` — the PeriodicGaitMPC / MPCJump interface.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

import jax.numpy as jnp

from .simulator import LeggedSimulator, SimState


@dataclasses.dataclass
class MPCSimulationLog:
    t: List[float] = dataclasses.field(default_factory=list)
    q: List[np.ndarray] = dataclasses.field(default_factory=list)
    v: List[np.ndarray] = dataclasses.field(default_factory=list)
    u: List[np.ndarray] = dataclasses.field(default_factory=list)
    kkt: List[float] = dataclasses.field(default_factory=list)

    def as_arrays(self):
        return {k: np.asarray(getattr(self, k))
                for k in ("t", "q", "v", "u", "kkt")}

    def save(self, log_dir: str):
        """Write q/v/u/t/kkt logs like the reference
        (mpc_simulation.py:24-35 text logs)."""
        import os
        os.makedirs(log_dir, exist_ok=True)
        for k, arr in self.as_arrays().items():
            np.savetxt(os.path.join(log_dir, f"{k}.log"),
                       np.atleast_2d(arr))
        return os.path.abspath(log_dir)


class MPCSimulation:
    def __init__(self, simulator: LeggedSimulator):
        self.simulator = simulator
        self.log = MPCSimulationLog()

    def run(self, mpc, t0: float, q0, simulation_time: float,
            control_dt: float,
            feedback_policy: bool = False, feedback_delay: bool = False,
            simulation_steps_per_mpc_update: int = 1,
            verbose: bool = False, v0=None) -> MPCSimulationLog:
        """Closed-loop run from (t0, q0, v0) for `simulation_time` seconds
        at control period `control_dt`; the plant substeps at the
        simulator's own sim_dt within each control tick."""
        assert simulation_steps_per_mpc_update >= 1
        m = self.simulator.model
        n_sub = max(1, int(round(control_dt / self.simulator.sim_dt)))
        v0 = np.zeros(m.nv) if v0 is None else v0
        state = self.simulator.init(q0, v0, t0)
        self.log = MPCSimulationLog()
        # departure from the reference (mpc_simulation.py:37: feedback
        # only when the MPC runs slower than the sim): the LQR policy is
        # useful every tick here because the penalty-ground plant is
        # deliberately softer than the solver's rigid-contact model
        use_fb = feedback_policy
        inner = 0                      # 0 -> MPC update on this tick
        n_ticks = int(round(simulation_time / control_dt))
        kkt = float("nan")
        for _ in range(n_ticks):
            t = float(state.t)
            q = np.asarray(state.q)
            v = np.asarray(state.v)
            if feedback_delay:
                u = self._control(mpc, t, q, v, use_fb)
            if inner == 0:
                kkt = mpc.update_solution(t, control_dt, q, v)
                inner = simulation_steps_per_mpc_update - 1
            else:
                inner -= 1
            if not feedback_delay:
                u = self._control(mpc, t, q, v, use_fb)
            if verbose:
                print(f"t = {t:.4f}  kkt = {kkt:.3e}")
            state = self.simulator.step(state, u, n_substeps=n_sub)
            self.log.t.append(t)
            self.log.q.append(q)
            self.log.v.append(v)
            self.log.u.append(np.asarray(u))
            self.log.kkt.append(float(kkt))
        return self.log

    @staticmethod
    def _control(mpc, t, q, v, use_fb):
        if use_fb:
            pol = mpc.get_control_policy(t)
            dimu = pol.tauJ.shape[0]
            return pol.control_input(q[-dimu:], v[-dimu:])
        return np.asarray(mpc.get_initial_control_input())
