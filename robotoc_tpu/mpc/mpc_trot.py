"""MPCTrot: packaged whole-body trot MPC for quadrupeds.

TPU-native counterpart of the reference's MPCTrot
(reference: include/robotoc/mpc/mpc_trot.hpp:40, src/mpc/mpc_trot.cpp:13-373):
builds the cost stack (configuration + 4 swing-foot + CoM), the constraint
stack (joint limits + friction cones), and a sliding trot contact schedule
driven by a foot-step planner; each control-rate update re-bakes the schedule
and reference arrays (host-side, shapes static) and runs a fixed number of
jitted Newton updates.

Gait timing (feet order LF, LH, RF, RH; pairs A=(LF,RH), B=(LH,RF)):
  swing s (s = 1, 2, ...) runs [ts(s), ts(s) + swing_time],
  ts(s) = swing_start_time + (s-1) * (swing_time + stance_time);
  odd s swings pair B, even s swings pair A; touchdown is an impact event.
"""
from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..constraints.joint_limits import JointLimits, make_joint_limits
from ..costs.config_cost import make_config_cost
from ..costs.task_cost import CoMCost, TaskSpace3DCost
from ..models import contacts as ct
from ..models import robot as rm
from ..planner.contact_sequence import ContactSchedule, discretize
from ..solver.ocp_solver import (OCPSolver, SolverOptions,
                                 align_solution)
from .foot_step_planner import TrotFootStepPlanner
from .refs import StepCoMRef, StepSwingFootRef

FEET_DEFAULT = ["LF_FOOT", "LH_FOOT", "RF_FOOT", "RH_FOOT"]
PAIR_A = (0, 3)
PAIR_B = (1, 2)


class MPCTrot:
    def __init__(self, model: rm.RobotModel, T: float, N: int,
                 feet=None, friction_coefficient: float = 0.5,
                 options: SolverOptions = SolverOptions(max_iter=2),
                 baumgarte_time_step: float = 0.05):
        self.model = model
        feet = feet or FEET_DEFAULT
        self.contacts = ct.make_contacts(
            model, feet, baumgarte_time_step=baumgarte_time_step)
        self.T, self.N = float(T), int(N)
        self.friction = friction_coefficient
        nv, dimu = model.nv, model.dimu
        dt = model.dtype
        # cost weights (reference src/mpc/mpc_trot.cpp:42-81)
        self.config_cost = make_config_cost(
            model,
            q_weight=jnp.asarray([0, 0, 0, 250000, 250000, 250000]
                                 + [0.0001] * (nv - 6), dt),
            v_weight=jnp.asarray([100.0] * 6 + [1.0] * (nv - 6), dt),
            a_weight=jnp.asarray([1e-6] * nv, dt),
            u_weight=jnp.asarray([1e-2] * dimu, dt),
            q_weight_terminal=jnp.asarray(
                [0, 0, 0, 250000, 250000, 250000] + [0.0001] * (nv - 6), dt),
            v_weight_terminal=jnp.asarray([100.0] * 6 + [1.0] * (nv - 6),
                                          dt),
            q_weight_impact=jnp.asarray(
                [0, 0, 0, 100, 100, 100] + [0.1] * (nv - 6), dt),
            v_weight_impact=jnp.asarray([100.0] * nv, dt),
            dv_weight_impact=jnp.asarray([1e-3] * nv, dt),
        )
        self.foot_weight = jnp.full(3, 1e6, dt)
        self.com_weight = jnp.full(3, 1e4, dt)
        self.limits = make_joint_limits(model)
        self.n_reserved = max(2, int(math.ceil(T / 0.2)) + 1)
        self.planner: Optional[TrotFootStepPlanner] = None
        self.swing_height = 0.1
        self.swing_time = 0.25
        self.stance_time = 0.0
        self.swing_start_time = 0.5
        self._solver: Optional[OCPSolver] = None
        self._options = options
        self.sol = None
        self.grid = None
        self._costs = None

    # ------------------------------------------------------------------
    def set_gait_pattern(self, planner: TrotFootStepPlanner,
                         swing_height: float, swing_time: float,
                         stance_time: float, swing_start_time: float):
        self.planner = planner
        self.swing_height = float(swing_height)
        self.swing_time = float(swing_time)
        self.stance_time = float(stance_time)
        self.swing_start_time = float(swing_start_time)
        period = swing_time + stance_time
        self.n_reserved = int(math.ceil(self.T / period)) + 2
        self.K = self.n_reserved + 2      # planner step cap

    # ------------------------------------------------------------------
    def _swing_pair(self, s: int):
        return PAIR_B if s % 2 == 1 else PAIR_A

    def _ts(self, s: int) -> float:
        return self.swing_start_time + (s - 1) * (self.swing_time
                                                  + self.stance_time)

    def _current_swing(self, t: float) -> int:
        """0 while standing; s while swing s or its following stance."""
        if t < self.swing_start_time:
            return 0
        return int(np.floor((t - self.swing_start_time)
                            / (self.swing_time + self.stance_time))) + 1

    def _active_at(self, t: float):
        s = self._current_swing(t)
        if s == 0:
            return [True] * 4
        ts = self._ts(s)
        if t <= ts + self.swing_time + 1e-9:
            pair = self._swing_pair(s)
            return [i not in pair for i in range(4)]
        return [True] * 4     # stance window

    # ------------------------------------------------------------------
    def _build_schedule_and_costs(self, t, q, v):
        """Plan future steps; bake schedule + reference arrays."""
        m = self.model
        dtype = m.dtype
        s_now = self._current_swing(t)
        active_now = self._active_at(t)
        plan = self.planner.plan(t, q, v, active_now, self.K)
        assert plan is not None, "planner failed (unsupported contact state)"
        positions, coms, Rs = plan     # (K+1, 4, 3), (K+1, 3), ...

        sched = ContactSchedule(nc=4, default_friction=self.friction)
        sched.init(active_now, positions[0])
        # future events within (t, t + T]
        j = 1                           # planner step offset
        s = s_now if s_now > 0 else 0
        while True:
            s_next = s + 1
            ts = self._ts(s_next)
            te = ts + self.swing_time
            if ts > t + self.T + 1e-9:
                break
            if ts > t:                 # lift: swing pair leaves the ground
                pair = self._swing_pair(s_next)
                act = [i not in pair for i in range(4)]
                sched.push_back(act, positions[min(j, self.K)], ts)
            if te > t and te <= t + self.T + 1e-9:
                if self.stance_time > 0:
                    sched.push_back([True] * 4, positions[min(j, self.K)],
                                    te)
            s = s_next
            j += 1
        # touchdown impacts with stance_time == 0 are encoded by the next
        # lift (simultaneous activate+deactivate) — push an explicit
        # all-four impact instant is unnecessary; landing feet activate at
        # the next phase boundary. For zero stance the next lift IS the
        # touchdown: the pushed status activates the landed pair.

        grid = discretize(sched, t, self.T, self.N,
                          n_reserved=self.n_reserved, dtype=dtype)

        # swing-foot refs: positions entry j = placements at start of
        # phase j; foot i swinging at absolute step s occupies phase
        # p = s - s_now (or p = s while standing), interpolating
        # positions[p] -> positions[p+1] (reference
        # mpc_periodic_swing_foot_ref.cpp:94-105).
        foot_costs = []
        K = self.K
        npos = positions.shape[0]

        def phase_of(s_abs):
            return s_abs - s_now if s_now >= 1 else s_abs

        for i in range(4):
            t_start = np.full(K, 1e9)
            x_prev = np.zeros((K, 3))
            x_next = np.zeros((K, 3))
            valid = np.zeros(K)
            slot = 0
            for s_abs in range(max(1, s_now), s_now + K + 1):
                if i in self._swing_pair(s_abs) and slot < K:
                    pph = min(phase_of(s_abs), npos - 2)
                    t_start[slot] = self._ts(s_abs)
                    x_prev[slot] = positions[pph][i]
                    x_next[slot] = positions[pph + 1][i]
                    valid[slot] = 1.0
                    slot += 1
            order = np.argsort(t_start)
            ref = StepSwingFootRef(
                x_prev=jnp.asarray(x_prev[order], dtype),
                x_next=jnp.asarray(x_next[order], dtype),
                t_start=jnp.asarray(t_start[order], dtype),
                swing_time=jnp.asarray(self.swing_time, dtype),
                step_height=jnp.asarray(self.swing_height, dtype),
                valid=jnp.asarray(valid[order], dtype))
            foot_costs.append(TaskSpace3DCost(
                frame_id=self.contacts.frame_ids[i],
                weight=self.foot_weight,
                weight_terminal=self.foot_weight,
                weight_impact=self.foot_weight, ref=ref))
        # CoM ref: phase-aligned, includes the in-progress swing
        t_start = np.full(K, 1e9)
        com_steps = np.zeros((K + 1, 3))
        valid = np.zeros(K)
        com_steps[0] = coms[min(phase_of(max(1, s_now)), npos - 2)]
        for k, s_abs in enumerate(range(max(1, s_now), s_now + K)):
            pph = min(phase_of(s_abs), npos - 2)
            t_start[k] = self._ts(s_abs)
            com_steps[k + 1] = coms[pph + 1]
            valid[k] = 1.0
        com_ref = StepCoMRef(com_steps=jnp.asarray(com_steps, dtype),
                             t_start=jnp.asarray(t_start, dtype),
                             swing_time=jnp.asarray(self.swing_time, dtype),
                             valid=jnp.asarray(valid, dtype))
        com_cost = CoMCost(weight=self.com_weight,
                           weight_terminal=self.com_weight,
                           weight_impact=self.com_weight, ref=com_ref)
        costs = (self.config_cost, *foot_costs, com_cost)
        return grid, costs

    # ------------------------------------------------------------------
    def init(self, t, q, v, num_iters: int = 20):
        """Solve the initial OCP to convergence
        (reference mpc_trot.cpp:160-187)."""
        q = jnp.asarray(q, self.model.dtype)
        v = jnp.asarray(v, self.model.dtype)
        self.config_cost = self.config_cost.replace(q_ref=q)
        self.planner.init(q)
        grid, costs = self._build_schedule_and_costs(float(t), q, v)
        if self._solver is None:
            self._solver = OCPSolver(
                self.model, self.contacts, costs, self.limits,
                self.T, self.N, options=self._options,
                n_reserved_events=self.n_reserved)
        sol = self._solver.init_solution(grid, q, v)
        for _ in range(num_iters):
            sol, kkt, _ = self._solver.update(grid, q, v, sol, costs=costs)
        self.sol, self.grid, self._costs = sol, grid, costs
        return float(kkt)

    def update_solution(self, t, dt, q, v, max_iter: int = 2):
        """One MPC update (reference mpc_trot.cpp:207-224)."""
        q = jnp.asarray(q, self.model.dtype)
        v = jnp.asarray(v, self.model.dtype)
        grid, costs = self._build_schedule_and_costs(float(t), q, v)
        sol = align_solution(self.sol, self.grid, grid)
        kkt = None
        for _ in range(max_iter):
            sol, kkt, _ = self._solver.update(grid, q, v, sol, costs=costs)
        self.sol, self.grid, self._costs = sol, grid, costs
        return float(kkt)

    # ------------------------------------------------------------------
    def get_initial_control_input(self):
        return self.sol.u[0]

    def kkt_error(self, t, q, v):
        return self._solver.kkt_error(self.grid, q, v, self.sol,
                                      costs=self._costs)
