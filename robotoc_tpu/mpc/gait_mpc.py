"""Generic periodic-gait whole-body MPC for quadrupeds.

One parameterized implementation covering the reference's per-gait MPC
classes and foot-step planners (reference: src/mpc/mpc_trot.cpp:13-373,
mpc_pace.cpp, mpc_crawl.cpp, mpc_flying_trot.cpp and the matching
*_foot_step_planner.cpp files). A gait is a CYCLE of swing sets — which feet
are airborne at step s — plus (swing_time, stance_time | flying_time)
timing:

    trot         cycle = ((LH,RF), (LF,RH))          stance_time >= 0
    pace         cycle = ((RF,RH), (LF,LH))          stance_time >= 0
    crawl        cycle = ((RH,), (RF,), (LH,), (LF,)) stance_time >= 0
    flying trot  cycle = ((LH,RF), (LF,RH))          flying_time > 0
                 (all feet airborne between steps; touchdown = impact)

The host side bakes the sliding contact schedule + step-indexed reference
arrays each control update (values change, shapes don't); the jitted
contact-OCP solver (solver/ocp_solver.py) never recompiles as the gait
slides forward.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..constraints.joint_limits import make_joint_limits
from ..costs.config_cost import make_config_cost
from ..costs.task_cost import (BaseRotationCost, CoMCost,
                               MultiFrameTaskCost, TaskSpace3DCost)
from ..models import com as com_fn
from ..models import forward_kinematics, frame_placement
from ..models import robot as rm
from ..models import contacts as ct
from ..planner.contact_sequence import ContactSchedule, discretize
from ..solver.ocp_solver import OCPSolver, SolverOptions, align_solution
from .foot_step_planner import GaitFootStepPlanner
from .refs import (StepBaseRotRef, StepCoMRef,
                   StepConfigurationRef, StepSwingFootRef)

FEET_DEFAULT = ["LF_FOOT", "LH_FOOT", "RF_FOOT", "RH_FOOT"]


class PeriodicGaitMPC:
    """Whole-body MPC over a periodic gait cycle (generalizes
    reference MPCTrot/MPCPace/MPCCrawl/MPCFlyingTrot)."""

    #: swing sets per step within one gait cycle; override per gait
    CYCLE: Tuple[Tuple[int, ...], ...] = ((1, 2), (0, 3))
    #: build the base-rotation tracking cost as a ConfigurationSpaceCost
    #: with a time-varying StepConfigurationRef (the reference's exact
    #: formulation) instead of the dedicated BaseRotationCost
    BASE_ROT_VIA_CONFIG_REF: bool = False

    def __init__(self, model: rm.RobotModel, T: float, N: int,
                 feet=None, friction_coefficient: float = 0.5,
                 options: SolverOptions = SolverOptions(
                     max_iter=2, switching_constraints=True),
                 baumgarte_time_step: float = 0.05,
                 contact_types=None, rect=(0.05, 0.025)):
        self.model = model
        feet = feet or FEET_DEFAULT
        self.feet = feet
        self.nc = len(feet)
        self.contacts = ct.make_contacts(
            model, feet, types=contact_types,
            baumgarte_time_step=baumgarte_time_step, rect=rect)
        self.T, self.N = float(T), int(N)
        self.friction = friction_coefficient
        nv, dimu = model.nv, model.dimu
        dt = model.dtype
        # cost weights — the reference's exact trot stack
        # (mpc_trot.cpp:42-81: joints 0.001 / impact 1, v 1.0, u 1e-2,
        # base-rot 1000 via a separate time-varying ref, feet 1e4 and CoM
        # 1e3 STAGE-ONLY — terminal/impact task weights default to zero).
        # Round-2 used the standing-benchmark weights (base-rot 2.5e5,
        # feet 1e6 incl. terminal), which blew up the terminal KKT rows
        # whenever a swing ref crossed the horizon end and throttled the
        # fraction-to-boundary step to ~0.05 in closed loop.
        self.config_cost = make_config_cost(
            model,
            q_weight=jnp.asarray([0.0] * 6 + [0.001] * (nv - 6), dt),
            v_weight=jnp.full(nv, 1.0, dt),
            a_weight=jnp.full(nv, 1e-6, dt),
            u_weight=jnp.full(dimu, 1e-2, dt),
            q_weight_terminal=jnp.asarray(
                [0.0] * 6 + [0.001] * (nv - 6), dt),
            v_weight_terminal=jnp.full(nv, 1.0, dt),
            q_weight_impact=jnp.asarray([0.0] * 6 + [1.0] * (nv - 6), dt),
            v_weight_impact=jnp.full(nv, 1.0, dt),
            dv_weight_impact=jnp.full(nv, 1e-3, dt),
        )
        self.base_rot_weight = jnp.full(3, 1000.0, dt)
        self.foot_weight = jnp.full(3, 1e4, dt)
        self.com_weight = jnp.full(3, 1e3, dt)
        self.limits = make_joint_limits(model)
        self.n_reserved = max(2, int(math.ceil(T / 0.2)) + 1)
        self.planner: Optional[GaitFootStepPlanner] = None
        self.swing_height = 0.1
        self.swing_time = 0.25
        self.stance_time = 0.0
        self.flying_time = 0.0
        self.swing_start_time = 0.5
        self._solver: Optional[OCPSolver] = None
        self._options = options
        self.sol = None
        self.grid = None
        self._costs = None

    # ------------------------------------------------------------------
    def make_planner(self, first_step_factor: float = 0.5, terrain=None):
        """terrain: optional height map z = terrain(x, y); planned
        placements (and hence swing/contact refs) follow the surface."""
        return GaitFootStepPlanner(self.model, self.feet, self.CYCLE,
                                   first_step_factor, terrain=terrain)

    def set_gait_pattern(self, planner: GaitFootStepPlanner,
                         swing_height: float, swing_time: float,
                         stance_time: float, swing_start_time: float,
                         flying_time: float = 0.0):
        """(reference MPC*::setGaitPattern; for flying trot, stance_time
        plays the reference's `flying_time` role via flying_time > 0)."""
        self.planner = planner
        planner.has_flight_phase = flying_time > 0.0
        self.swing_height = float(swing_height)
        self.swing_time = float(swing_time)
        self.stance_time = float(stance_time)
        self.flying_time = float(flying_time)
        self.swing_start_time = float(swing_start_time)
        period = swing_time + stance_time + flying_time
        self.n_reserved = int(math.ceil(self.T / period)) + 2
        self.K = self.n_reserved + 2      # planner step cap

    # -- gait timing ------------------------------------------------------
    def _step_period(self) -> float:
        return self.swing_time + self.stance_time + self.flying_time

    def _ts(self, s: int) -> float:
        return self.swing_start_time + (s - 1) * self._step_period()

    def _current_swing(self, t: float) -> int:
        if t < self.swing_start_time:
            return 0
        return int(np.floor((t - self.swing_start_time)
                            / self._step_period())) + 1

    def _swing_set(self, s: int):
        return self.planner.cycle[(s - 1) % len(self.planner.cycle)]

    def _active_at(self, t: float):
        s = self._current_swing(t)
        if s == 0:
            return [True] * self.nc
        ts = self._ts(s)
        if t <= ts + self.swing_time + 1e-9:
            sw = self._swing_set(s)
            return [i not in sw for i in range(self.nc)]
        if self.flying_time > 0 and t <= ts + self.swing_time \
                + self.flying_time + 1e-9:
            return [False] * self.nc          # flight
        return [True] * self.nc               # stance window

    def _swing_window(self, s: int):
        """(start, duration) of step s's foot-swing trajectory."""
        ts = self._ts(s)
        if self.flying_time > 0:
            # feet lift at the previous flight start and land at ts(s+1)
            start = ts - self.flying_time if s > 1 else ts
            return start, self.swing_time + self.flying_time + (
                self.flying_time if s > 1 else 0.0)
        return ts, self.swing_time

    # ------------------------------------------------------------------
    def _build_schedule_and_costs(self, t, q, v):
        """Plan future steps; bake schedule + reference arrays
        (reference MPC*::updateSolution -> addStep + resetContactPlacements)."""
        m = self.model
        dtype = m.dtype
        nc = self.nc
        s_now = self._current_swing(t)
        active_now = self._active_at(t)
        plan = self.planner.plan(t, q, v, active_now, self.K)
        assert plan is not None, "planner failed (unsupported contact state)"
        positions, coms, Rs = plan

        sched = ContactSchedule(nc=nc, default_friction=self.friction)
        sched.init(active_now, positions[0])
        j = 1
        s = s_now if s_now > 0 else 0
        while True:
            s_next = s + 1
            ts = self._ts(s_next)
            te = ts + self.swing_time
            if ts > t + self.T + 1e-9:
                break
            if ts > t:                 # swing begins (lift of swing set)
                sw = self._swing_set(s_next)
                act = [i not in sw for i in range(nc)]
                sched.push_back(act, positions[min(j, self.K)], ts)
            if self.flying_time > 0:
                tf = te + self.flying_time
                if te > t and te <= t + self.T + 1e-9:
                    sched.push_back([False] * nc,
                                    positions[min(j, self.K)], te)
            elif self.stance_time > 0 and te > t \
                    and te <= t + self.T + 1e-9:
                sched.push_back([True] * nc, positions[min(j, self.K)], te)
            s = s_next
            j += 1

        grid = discretize(sched, t, self.T, self.N,
                          n_reserved=self.n_reserved, dtype=dtype)

        # swing-foot references (reference mpc_periodic_swing_foot_ref.cpp)
        K = self.K
        npos = positions.shape[0]

        def phase_of(s_abs):
            return s_abs - s_now if s_now >= 1 else s_abs

        # bake all feet into numpy and convert to device arrays ONCE
        # (per-leaf eager conversions were a measurable slice of the
        # host ms/update, round-2 review item #6)
        ts_all = np.full((nc, K), 1e9)
        durs_all = np.full((nc, K), self.swing_time)
        xp_all = np.zeros((nc, K, 3))
        xn_all = np.zeros((nc, K, 3))
        val_all = np.zeros((nc, K))
        for i in range(nc):
            slot = 0
            for s_abs in range(max(1, s_now), s_now + K + 1):
                if i in self._swing_set(s_abs) and slot < K:
                    pph = min(phase_of(s_abs), npos - 2)
                    w0, wd = self._swing_window(s_abs)
                    ts_all[i, slot] = w0
                    durs_all[i, slot] = wd
                    xp_all[i, slot] = positions[pph][i]
                    xn_all[i, slot] = positions[pph + 1][i]
                    val_all[i, slot] = 1.0
                    slot += 1
            order = np.argsort(ts_all[i])
            ts_all[i] = ts_all[i][order]
            durs_all[i] = durs_all[i][order]
            xp_all[i] = xp_all[i][order]
            xn_all[i] = xn_all[i][order]
            val_all[i] = val_all[i][order]
        stacked_foot_refs = StepSwingFootRef(
            x_prev=jnp.asarray(xp_all, dtype),
            x_next=jnp.asarray(xn_all, dtype),
            t_start=jnp.asarray(ts_all, dtype),
            swing_time=jnp.asarray(durs_all, dtype),
            step_height=jnp.broadcast_to(
                jnp.asarray(self.swing_height, dtype), (nc,)),
            valid=jnp.asarray(val_all, dtype))
        # CoM reference (reference mpc_periodic_com_ref.cpp)
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
                             swing_time=jnp.asarray(
                                 self.swing_time + self.flying_time, dtype),
                             valid=jnp.asarray(valid, dtype))
        # base-rotation reference: slerp the planner's per-step yaw
        # rotations over the swing windows (reference
        # mpc_periodic_configuration_ref.cpp:95-110); step indexing
        # mirrors the CoM-ref baking above. Planner rotations are pure
        # yaw, so the quaternion is closed-form in numpy.
        def _yaw_quat(R):
            yaw = np.arctan2(R[1, 0], R[0, 0])
            return np.array([0.0, 0.0, np.sin(0.5 * yaw),
                             np.cos(0.5 * yaw)])

        quat_steps = np.zeros((K + 1, 4))
        quat_steps[0] = _yaw_quat(Rs[min(phase_of(max(1, s_now)),
                                         npos - 2)])
        for k, s_abs in enumerate(range(max(1, s_now), s_now + K)):
            pph = min(phase_of(s_abs), npos - 2)
            quat_steps[k + 1] = _yaw_quat(Rs[pph + 1])
        if self.BASE_ROT_VIA_CONFIG_REF:
            # reference-exact formulation: a second ConfigurationSpaceCost
            # whose time-varying q_ref slerps the base quaternion between
            # planner steps (mpc_crawl.cpp:57-63 base_rot_cost_ +
            # mpc_periodic_configuration_ref.cpp:95-110)
            nv = self.model.nv
            w_rot = jnp.zeros(nv, dtype).at[3:6].set(self.base_rot_weight)
            cfg_ref = StepConfigurationRef(
                q=self.config_cost.q_ref,
                quat_steps=jnp.asarray(quat_steps, dtype),
                t_start=jnp.asarray(t_start, dtype),
                swing_time=jnp.asarray(
                    self.swing_time + self.flying_time, dtype),
                valid=jnp.asarray(valid, dtype))
            base_rot_cost = make_config_cost(
                self.model, q_ref_fn=cfg_ref, q_weight=w_rot,
                q_weight_terminal=w_rot, q_weight_impact=w_rot)
        else:
            base_rot_ref = StepBaseRotRef(
                quat_steps=jnp.asarray(quat_steps, dtype),
                t_start=jnp.asarray(t_start, dtype),
                swing_time=jnp.asarray(self.swing_time + self.flying_time,
                                       dtype),
                valid=jnp.asarray(valid, dtype))
            base_rot_cost = BaseRotationCost(
                weight=self.base_rot_weight,
                weight_terminal=self.base_rot_weight,
                weight_impact=self.base_rot_weight,
                ref=base_rot_ref)
        # ONE fused multi-frame task cost (feet + CoM share a single FK
        # chain + jacfwd) instead of nc TaskSpace3DCost + CoMCost — 3x
        # smaller stage-kernel XLA module, same math. Terminal/impact task
        # weights are ZERO like the reference (task_space_3d_cost.cpp:11-12
        # defaults, never set by the MPC classes).
        zero3 = jnp.zeros(3, dtype)
        task_cost = MultiFrameTaskCost(
            frame_ids=self.contacts.frame_ids,
            foot_weight=self.foot_weight,
            foot_weight_terminal=zero3,
            foot_weight_impact=zero3,
            com_weight=self.com_weight,
            com_weight_terminal=zero3,
            com_weight_impact=zero3,
            foot_refs=stacked_foot_refs, com_ref=com_ref)
        costs = (self.config_cost, base_rot_cost, task_cost)
        return grid, costs

    # ------------------------------------------------------------------
    def init(self, t, q, v, num_iters: int = 20):
        """Solve the initial OCP to convergence (reference MPC*::init)."""
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
        kkt = np.inf
        policy = None
        for _ in range(num_iters):
            sol, kkt, _, policy = self._solver.update(grid, q, v, sol,
                                                      costs=costs)
        self.sol, self.grid, self._costs = sol, grid, costs
        self.lqr_policy = policy
        return float(kkt)

    def update_solution(self, t, dt, q, v, max_iter: int = 2):
        """One MPC update (reference MPC*::updateSolution)."""
        q = jnp.asarray(q, self.model.dtype)
        v = jnp.asarray(v, self.model.dtype)
        grid, costs = self._build_schedule_and_costs(float(t), q, v)
        sol = align_solution(self.sol, self.grid, grid,
                             model=self.model)
        kkt = None
        for _ in range(max_iter):
            sol, kkt, _, policy = self._solver.update(grid, q, v, sol,
                                                      costs=costs)
        self.sol, self.grid, self._costs = sol, grid, costs
        self.lqr_policy = policy
        return float(kkt)

    # ------------------------------------------------------------------
    def get_initial_control_input(self):
        return self.sol.u[0]

    def get_control_policy(self, t: float):
        """Interpolated PD+feedforward policy at time t
        (reference mpc/control_policy.hpp:17-102)."""
        from .control_policy import ControlPolicy
        return ControlPolicy.from_solution(self.model, self.grid, self.sol,
                                           self.lqr_policy, t)

    def kkt_error(self, t, q, v):
        return self._solver.kkt_error(self.grid, q, v, self.sol,
                                      costs=self._costs)


class MPCPace(PeriodicGaitMPC):
    """Pace gait: lateral pairs; right side (RF, RH) swings first
    (reference src/mpc/mpc_pace.cpp:100-106,297)."""
    CYCLE = ((2, 3), (0, 1))
    BASE_ROT_VIA_CONFIG_REF = True


class MPCCrawl(PeriodicGaitMPC):
    """Crawl gait: one foot at a time, order RH, RF, LH, LF
    (reference src/mpc/mpc_crawl.cpp:100-104,
    crawl_foot_step_planner.cpp:162-238)."""
    CYCLE = ((3,), (2,), (1,), (0,))
    BASE_ROT_VIA_CONFIG_REF = True


class MPCFlyingTrot(PeriodicGaitMPC):
    """Flying trot: diagonal pairs with a flight phase between steps
    (reference src/mpc/mpc_flying_trot.cpp:100-102)."""
    CYCLE = ((1, 2), (0, 3))

    def set_gait_pattern(self, planner, swing_height, swing_time,
                         flying_time, swing_start_time):
        super().set_gait_pattern(planner, swing_height, swing_time,
                                 stance_time=0.0,
                                 swing_start_time=swing_start_time,
                                 flying_time=flying_time)


class MPCBipedWalk(PeriodicGaitMPC):
    """Humanoid walking MPC with surface contacts + contact wrench cones
    (reference src/mpc/mpc_biped_walk.cpp:40-100, examples/icub/mpc/walk.py).
    Feet order (l_sole, r_sole); the right foot swings first
    (mpc_biped_walk.cpp:288)."""
    CYCLE = ((1,), (0,))
    FEET_BIPED = ["l_sole", "r_sole"]

    def __init__(self, model: rm.RobotModel, T: float, N: int,
                 feet=None, friction_coefficient: float = 0.5,
                 options: SolverOptions = SolverOptions(
                     max_iter=2, switching_constraints=True),
                 baumgarte_time_step: float = 0.05,
                 wrench_cone_rect=(0.1, 0.05)):
        feet = feet or self.FEET_BIPED
        super().__init__(model, T, N, feet=feet,
                         friction_coefficient=friction_coefficient,
                         options=options,
                         baumgarte_time_step=baumgarte_time_step,
                         contact_types=(ct.SURFACE,) * len(feet),
                         rect=wrench_cone_rect)
        nv, dimu = model.nv, model.dimu
        dt = model.dtype
        # biped cost stack (mpc_biped_walk.cpp:42-68: config 0.001 joints +
        # base-rot 1000, v 1.0, u 1e-2; impact q 1/rot 1000, dv 1e-2)
        self.config_cost = make_config_cost(
            model,
            q_weight=jnp.asarray([0, 0, 0, 1000, 1000, 1000]
                                 + [0.001] * (nv - 6), dt),
            v_weight=jnp.full(nv, 1.0, dt),
            a_weight=jnp.full(nv, 1e-6, dt),
            u_weight=jnp.full(dimu, 1e-2, dt),
            q_weight_terminal=jnp.asarray(
                [0, 0, 0, 1000, 1000, 1000] + [0.001] * (nv - 6), dt),
            v_weight_terminal=jnp.full(nv, 1.0, dt),
            q_weight_impact=jnp.asarray(
                [0, 0, 0, 1000, 1000, 1000] + [1.0] * (nv - 6), dt),
            v_weight_impact=jnp.full(nv, 1.0, dt),
            dv_weight_impact=jnp.full(nv, 1e-2, dt),
        )
        self.foot_weight = jnp.full(3, 1e4, dt)
        self.com_weight = jnp.full(3, 1e3, dt)

    def set_wrench_cone_rectangular(self, X: float, Y: float):
        """(reference ContactWrenchCone::setRectangular +
        examples/icub/mpc/walk.py:38-41)."""
        self.contacts = self.contacts.replace(
            rect=jnp.broadcast_to(
                jnp.asarray([X, Y], self.model.dtype), (self.nc, 2)))


def pace_foot_step_planner(model, feet=None, first_step_factor=0.5):
    return GaitFootStepPlanner(model, feet or FEET_DEFAULT, MPCPace.CYCLE,
                               first_step_factor)


def crawl_foot_step_planner(model, feet=None, first_step_factor=0.5):
    return GaitFootStepPlanner(model, feet or FEET_DEFAULT, MPCCrawl.CYCLE,
                               first_step_factor)


def flying_trot_foot_step_planner(model, feet=None, first_step_factor=0.5):
    return GaitFootStepPlanner(model, feet or FEET_DEFAULT,
                               MPCFlyingTrot.CYCLE, first_step_factor)
