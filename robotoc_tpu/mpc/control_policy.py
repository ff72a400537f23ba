"""Interpolated PD + feedforward control policy from the MPC solution.

Reference: include/robotoc/mpc/control_policy.hpp:17-102,
src/mpc/control_policy.cpp — interpolates the solver solution and the
Riccati LQR gains at the query time t, yielding joint targets (qJ, dqJ),
feedforward torques tauJ, and local feedback gains (Kp, Kd) for a joint PD
controller running between MPC updates
(used by robotoc_sim/mpc_simulation.py:6-11 in the reference:
    u = tauJ - Kp (qJ_meas - qJ) - Kd (dqJ_meas - dqJ)).

Host-side O(1) interpolation over the solver's stacked arrays.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np


class ControlPolicy(NamedTuple):
    t: float
    tauJ: np.ndarray     # (dimu,)
    qJ: np.ndarray       # (dimu,)
    dqJ: np.ndarray      # (dimu,)
    Kp: np.ndarray       # (dimu, dimu)
    Kd: np.ndarray       # (dimu, dimu)

    @staticmethod
    def from_solution(model, grid, sol, lqr_policy, t: float):
        dimu = model.dimu
        nv = model.nv
        ts = np.asarray(grid.t)
        is_imp = np.asarray(grid.is_impact)
        u = np.asarray(sol.u)
        qJ = np.asarray(sol.q)[:, -dimu:]
        dqJ = np.asarray(sol.v)[:, -dimu:]
        K = np.asarray(lqr_policy.K)           # (S-1, dimu, 2nv)
        Kq = -K[:, :, nv - dimu:nv]            # feedback sign convention:
        Kv = -K[:, :, 2 * nv - dimu:]          # u = tauJ - Kp e_q - Kd e_v
        S = ts.shape[0]
        if t <= ts[0]:
            i0 = i1 = 0
            alpha = 1.0
        else:
            i1 = None
            for i in range(1, S - 1):
                if t < ts[i] and not is_imp[i - 1] > 0:
                    i1 = i
                    break
            if i1 is None:
                i0 = i1 = min(S - 2, K.shape[0] - 1)
                alpha = 1.0
            else:
                i0 = i1 - 1
                dt = ts[i1] - ts[i0]
                alpha = (ts[i1] - t) / dt if dt > 0 else 1.0
        iK0, iK1 = min(i0, K.shape[0] - 1), min(i1, K.shape[0] - 1)
        lerp = lambda a, b: alpha * a + (1.0 - alpha) * b
        return ControlPolicy(
            t=float(t),
            tauJ=lerp(u[i0], u[i1]),
            qJ=lerp(qJ[i0], qJ[i1]),
            dqJ=lerp(dqJ[i0], dqJ[i1]),
            Kp=lerp(Kq[iK0], Kq[iK1]),
            Kd=lerp(Kv[iK0], Kv[iK1]))

    def control_input(self, qJ_meas, dqJ_meas):
        """u = tauJ - Kp (qJ_meas - qJ) - Kd (dqJ_meas - dqJ)
        (reference robotoc_sim/mpc_simulation.py:6-11)."""
        eq = np.asarray(qJ_meas) - self.qJ
        ev = np.asarray(dqJ_meas) - self.dqJ
        return self.tauJ - self.Kp @ eq - self.Kd @ ev
