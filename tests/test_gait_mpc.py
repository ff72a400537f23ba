"""Gait planner + periodic-gait MPC schedule logic (host-side, fast).

Mirrors the reference's planner behavior checks (reference
src/mpc/*_foot_step_planner.cpp): step placements advance by step_length
per gait cycle, CoM advances proportionally, swing sets follow the cycle.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from robotoc_tpu.models import load_robot
from robotoc_tpu.mpc import (MPCCrawl, MPCFlyingTrot, MPCPace, MPCTrot,
                             TrotFootStepPlanner)
from robotoc_tpu.mpc.gait_mpc import FEET_DEFAULT

Q0 = np.array([0, 0, 0.4792, 0, 0, 0, 1, -0.1, 0.7, -1.0,
               -0.1, -0.7, 1.0, 0.1, 0.7, -1.0, 0.1, -0.7, 1.0])


@pytest.fixture(scope="module")
def model():
    return load_robot("anymal")


def test_trot_planner_advances(model):
    p = TrotFootStepPlanner(model, FEET_DEFAULT)
    step = np.array([0.2, 0.0, 0.0])
    p.set_gait_pattern(step, 0.0)
    p.init(Q0)
    positions, coms, Rs = p.plan(0.0, Q0, np.zeros(18), [True] * 4, 6)
    # entry 0 = current stance; entry 1 duplicates it (step-0 alignment,
    # reference trot_foot_step_planner.cpp:245-277); entry j+1 = after step j
    assert positions.shape[0] == 8
    assert np.allclose(positions[1], positions[0])
    # steady state: one full cycle (2 steps) advances every foot one step
    d_feet = positions[5] - positions[3]
    assert np.allclose(d_feet[:, 0], 0.2, atol=1e-9)
    # CoM advances half a step per step
    assert np.isclose(coms[4][0] - coms[3][0], 0.1, atol=1e-9)


def test_crawl_cycle_order(model):
    mpc = MPCCrawl(model, T=0.5, N=10)
    planner = mpc.make_planner()
    assert planner.cycle == ((3,), (2,), (1,), (0,))
    planner.set_gait_pattern(np.array([0.1, 0, 0]), 0.0)
    planner.init(Q0)
    positions, coms, _ = planner.plan(0.0, Q0, np.zeros(18), [True] * 4, 8)
    # crawl: single foot moves per step, in order RH(3), RF(2), LH(1), LF(0)
    moved1 = np.where(np.abs(positions[2] - positions[1]).sum(1) > 1e-12)[0]
    moved2 = np.where(np.abs(positions[3] - positions[2]).sum(1) > 1e-12)[0]
    moved3 = np.where(np.abs(positions[4] - positions[3]).sum(1) > 1e-12)[0]
    assert list(moved1) == [3] and list(moved2) == [2] \
        and list(moved3) == [1]
    # CoM advances a quarter step per crawl step (steady state)
    assert np.isclose(coms[3][0] - coms[2][0], 0.025, atol=1e-9)


def test_pace_cycle(model):
    mpc = MPCPace(model, T=0.5, N=10)
    assert mpc.CYCLE == ((2, 3), (0, 1))


def test_schedule_building_trot(model):
    mpc = MPCTrot(model, T=0.5, N=10)
    planner = mpc.make_planner()
    planner.set_gait_pattern(np.array([0.15, 0, 0]), 0.0)
    mpc.set_gait_pattern(planner, swing_height=0.1, swing_time=0.25,
                         stance_time=0.0, swing_start_time=0.2)
    mpc.planner.init(Q0)
    grid, costs = mpc._build_schedule_and_costs(
        0.0, jnp.asarray(Q0), jnp.zeros(18))
    t = np.asarray(grid.t)
    cm = np.asarray(grid.contact_mask)
    assert np.isclose(t[0], 0.0) and np.isclose(t[-1], 0.5)
    # standing until 0.2, then pair B=(1,2) swings
    i_pre = int(np.argmin(np.abs(t - 0.1)))
    assert cm[i_pre].sum() == 4
    i_sw = int(np.argmin(np.abs(t - 0.3)))
    assert cm[i_sw].sum() == 2 and cm[i_sw][0] == 1 and cm[i_sw][3] == 1
    # touchdown at 0.45 is an impact event slot
    imp = np.asarray(grid.is_impact)
    k = [i for i in range(len(imp) - 1) if imp[i] > 0
         and np.asarray(grid.imp_mask)[i].sum() > 0]
    assert len(k) == 1 and np.isclose(t[k[0]], 0.45)


def test_schedule_building_flying_trot(model):
    mpc = MPCFlyingTrot(model, T=0.6, N=12)
    planner = mpc.make_planner()
    planner.set_gait_pattern(np.array([0.2, 0, 0]), 0.0)
    mpc.set_gait_pattern(planner, swing_height=0.1, swing_time=0.15,
                         flying_time=0.06, swing_start_time=0.2)
    mpc.planner.init(Q0)
    grid, costs = mpc._build_schedule_and_costs(
        0.0, jnp.asarray(Q0), jnp.zeros(18))
    t = np.asarray(grid.t)
    cm = np.asarray(grid.contact_mask)
    # during flight (t ~ 0.38) no contact is active
    i_fly = int(np.argmin(np.abs(t - 0.38)))
    assert cm[i_fly].sum() == 0
    # stance on pair A=(0,3) during first step (t ~ 0.3): B=(1,2) swing
    i_st = int(np.argmin(np.abs(t - 0.3)))
    assert cm[i_st][0] == 1 and cm[i_st][3] == 1 and cm[i_st].sum() == 2


def test_control_policy_shapes(model):
    from robotoc_tpu.mpc.control_policy import ControlPolicy
    from robotoc_tpu.riccati.lqr import LQRPolicy  # type: ignore

    class G:
        t = jnp.linspace(0, 0.5, 11)
        is_impact = jnp.zeros(11)

    class S:
        u = jnp.ones((11, 12))
        q = jnp.zeros((11, 19))
        v = jnp.zeros((11, 18))

    class P:
        K = jnp.zeros((10, 12, 36))

    cp = ControlPolicy.from_solution(model, G, S, P, 0.12)
    assert cp.tauJ.shape == (12,) and cp.Kp.shape == (12, 12)
    u = cp.control_input(np.zeros(12), np.zeros(12))
    assert u.shape == (12,)


def test_crawl_mpc_periodic_config_ref(model):
    """Crawl MPC builds its base-rot cost via ConfigurationSpaceCost with
    a time-varying StepConfigurationRef (the reference's exact
    formulation, mpc_crawl.cpp:57-63 + mpc_periodic_configuration_ref
    .cpp:95-110) and a Newton update converges on it."""
    from robotoc_tpu.costs.config_cost import ConfigurationSpaceCost
    mpc = MPCCrawl(model, T=0.5, N=10)
    assert mpc.BASE_ROT_VIA_CONFIG_REF
    planner = mpc.make_planner()
    planner.set_gait_pattern(np.array([0.04, 0, 0]), 0.0)
    mpc.set_gait_pattern(planner, swing_height=0.05, swing_time=0.2,
                         stance_time=0.0, swing_start_time=0.3)
    kkt = mpc.init(0.0, Q0, np.zeros(18), num_iters=12)
    _, costs = mpc.grid, mpc._costs
    cfg_costs = [c for c in costs
                 if isinstance(c, ConfigurationSpaceCost)
                 and c.q_ref_fn is not None]
    assert len(cfg_costs) == 1
    assert np.isfinite(kkt) and kkt < 1e-2
