"""Host-side gait planners: trot foot-step planner + Raibert heuristic.

Re-derivation of the reference's planner layer (reference:
src/mpc/trot_foot_step_planner.cpp:126-240, mpc/raibert_heuristic.hpp:23-90,
mpc/moving_window_filter.hpp). These run on the host in numpy — they are
O(planning_steps) scalar logic executed once per MPC update; their OUTPUT
(planned contact positions / CoM / yaw per step) feeds the jitted solver as
arrays.

Trot conventions (feet order LF, LH, RF, RH):
  diagonal pair A = (LF, RH) = indices (0, 3), pair B = (LH, RF) = (1, 2);
  during a swing phase one pair stands, the other moves by step_length
  (rotated by the commanded yaw), and the CoM advances half a step.
"""
from __future__ import annotations

from collections import deque

import numpy as np

from ..models import robot as rm
from ..models import forward_kinematics, frame_placement, com as com_fn


class MovingWindowFilter:
    """Moving average over a trailing time window
    (reference mpc/moving_window_filter.hpp)."""

    def __init__(self, window: float):
        self.window = window
        self.data = deque()

    def clear(self):
        self.data.clear()

    def push(self, t, value):
        self.data.append((t, np.asarray(value, float)))
        while self.data and self.data[0][0] < t - self.window:
            self.data.popleft()

    def average(self):
        if not self.data:
            return 0.0
        return np.mean([v for _, v in self.data], axis=0)


class RaibertHeuristic:
    """step = 0.5 * period * v_avg + gain * (v_avg - v_cmd)
    (reference mpc/raibert_heuristic.hpp:23-90, src/mpc/raibert_heuristic.cpp)."""

    def __init__(self, period: float, gain: float):
        self.period = period
        self.gain = gain

    def step_length(self, vcom_avg, vcom_cmd, yaw_rate_cmd):
        v = np.asarray(vcom_avg, float)
        cmd = np.asarray(vcom_cmd, float)
        xy = 0.5 * self.period * v + self.gain * (v - cmd)
        return np.array([xy[0], xy[1], 0.0])


class TrotFootStepPlanner:
    """Plans contact placements / CoM / base yaw over future trot steps."""

    PAIR_A = (0, 3)   # LF, RH
    PAIR_B = (1, 2)   # LH, RF

    def __init__(self, model, feet_frames):
        self.model = model
        self.frame_ids = [model.frame_id(f) for f in feet_frames]
        self.step_length = np.zeros(3)
        self.R_yaw = np.eye(3)
        self.enable_stance_phase = False
        self.enable_raibert = False
        self.raibert = None
        self.vcom_filter = None
        self.vcom_cmd = np.zeros(3)
        self.yaw_rate_cmd = 0.0
        self.current_step = 0

    # -- gait pattern -----------------------------------------------------
    def set_gait_pattern(self, step_length, step_yaw,
                         enable_stance_phase=False):
        self.step_length = np.asarray(step_length, float)
        cy, sy = np.cos(step_yaw), np.sin(step_yaw)
        self.R_yaw = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1.0]])
        self.enable_stance_phase = enable_stance_phase
        self.enable_raibert = False

    def set_raibert_gait_pattern(self, vcom_cmd, yaw_rate_cmd, swing_time,
                                 stance_time, gain):
        period = 2.0 * (swing_time + stance_time)
        self.raibert = RaibertHeuristic(period, gain)
        self.vcom_filter = MovingWindowFilter(0.1 * period)
        self.vcom_cmd = np.asarray(vcom_cmd, float)
        self.yaw_rate_cmd = yaw_rate_cmd
        step_yaw = yaw_rate_cmd * (swing_time + stance_time)
        cy, sy = np.cos(step_yaw), np.sin(step_yaw)
        self.R_yaw = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1.0]])
        self.enable_stance_phase = stance_time > 0.0
        self.enable_raibert = True

    # -- lifecycle --------------------------------------------------------
    def init(self, q):
        q = np.asarray(q, float)
        R = _yaw_projection(_quat_to_R(q[3:7]))
        Rw, pw = forward_kinematics(self.model, q)
        com = np.asarray(com_fn(self.model, q))
        self.com_to_foot_local = [
            R.T @ (np.asarray(frame_placement(self.model, fid, Rw, pw)[1])
                   - com)
            for fid in self.frame_ids]
        self.current_step = 0
        if self.vcom_filter is not None:
            self.vcom_filter.clear()

    def plan(self, t, q, v, contact_active, planning_steps):
        """Returns (positions (steps+1, 4, 3), com (steps+1, 3),
        R (steps+1, 3, 3)) — entry 0 is the CURRENT stance."""
        q = np.asarray(q, float)
        if self.enable_raibert:
            self.vcom_filter.push(t, np.asarray(v[:3], float)[:2])
            vavg = self.vcom_filter.average()
            self.step_length = self.raibert.step_length(
                np.array([*np.atleast_1d(vavg), 0.0])[:2]
                if np.ndim(vavg) else np.zeros(2),
                self.vcom_cmd[:2], self.yaw_rate_cmd)
        Rw, pw = forward_kinematics(self.model, q)
        pos = [np.asarray(frame_placement(self.model, fid, Rw, pw)[1])
               for fid in self.frame_ids]
        R = getattr(self, "_R", _yaw_projection(_quat_to_R(q[3:7])))
        active = list(contact_active)
        com = np.zeros(3)
        if all(active):
            self.current_step = 0 if not self.enable_stance_phase else \
                self.current_step + (self.current_step % 2)
            com = np.mean([pos[i] - R @ self.com_to_foot_local[i]
                           for i in range(4)], axis=0)
        elif active[0] and active[3]:        # pair A stands, B swings
            if self.current_step % 2 != 1:
                self.current_step += 1
                R = self.R_yaw @ R
            com = 0.5 * ((pos[0] - R @ self.com_to_foot_local[0])
                         + (pos[3] - R @ self.com_to_foot_local[3]))
            for i in self.PAIR_B:
                pos[i] = com + R @ (self.com_to_foot_local[i]
                                    - 0.5 * self.step_length)
        elif active[1] and active[2]:        # pair B stands, A swings
            if self.current_step % 2 != 0:
                self.current_step += 1
                R = self.R_yaw @ R
            com = 0.5 * ((pos[1] - R @ self.com_to_foot_local[1])
                         + (pos[2] - R @ self.com_to_foot_local[2]))
            for i in self.PAIR_A:
                pos[i] = com + R @ (self.com_to_foot_local[i]
                                    - 0.5 * self.step_length)
        else:
            return None
        self._R = R

        # Entry j of the returned arrays = placements/CoM at the START of
        # contact phase j (relative to the current phase). The loop starts
        # AT current_step so the in-progress swing's target is re-planned,
        # and step==0 pushes a duplicate aligning entries with phases
        # (reference trot_foot_step_planner.cpp:245-277).
        positions = [np.stack(pos)]
        coms = [com.copy()]
        Rs = [R.copy()]
        step0 = self.current_step
        pos = [p.copy() for p in pos]
        for step in range(step0, step0 + planning_steps + 1):
            if step == 0:
                pass
            elif step0 == 0 and step == 1:
                R = self.R_yaw @ R
                adv = 0.5 if self.enable_raibert else 0.25
                com = com + adv * (R @ self.step_length)
                for i in self.PAIR_B:
                    pos[i] = com + R @ self.com_to_foot_local[i]
            else:
                R = self.R_yaw @ R
                com = com + 0.5 * (R @ self.step_length)
                moving = self.PAIR_B if step % 2 == 1 else self.PAIR_A
                for i in moving:
                    pos[i] = com + R @ self.com_to_foot_local[i]
            positions.append(np.stack([p.copy() for p in pos]))
            coms.append(com.copy())
            Rs.append(R.copy())
        return np.stack(positions), np.stack(coms), np.stack(Rs)


def _quat_to_R(quat_xyzw):
    x, y, z, w = quat_xyzw
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _yaw_projection(R):
    """Project onto a pure yaw rotation (reference utils/rotation.hpp:16-84
    ProjectRotationMatrix, Z axis)."""
    yaw = np.arctan2(R[1, 0], R[0, 0])
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
