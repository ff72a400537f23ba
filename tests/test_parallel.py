"""Scenario-batched MPC sharded over the virtual 8-device CPU mesh
(conftest sets xla_force_host_platform_device_count=8). Validates that the
sharded fleet update matches the single-device batched update exactly —
the multi-chip path of SURVEY.md §2.16 / BASELINE.json."""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robotoc_tpu.constraints.joint_limits import make_joint_limits
from robotoc_tpu.costs.config_cost import make_config_cost
from robotoc_tpu.models import forward_kinematics, frame_placement, load_robot
from robotoc_tpu.models import robot as rm
from robotoc_tpu.models.contacts import make_contacts
from robotoc_tpu.parallel import scenario as par
from robotoc_tpu.planner.contact_sequence import ContactSchedule, discretize
from robotoc_tpu.solver import ocp_solver as OS

FEET = ["LF_FOOT", "LH_FOOT", "RF_FOOT", "RH_FOOT"]
Q0 = jnp.array([0, 0, 0.4792, 0, 0, 0, 1, -0.1, 0.7, -1.0,
                -0.1, -0.7, 1.0, 0.1, 0.7, -1.0, 0.1, -0.7, 1.0])


@pytest.mark.slow
def test_sharded_fleet_matches_single_device():
    assert jax.device_count() >= 8, "conftest should provide 8 CPU devices"
    m = load_robot("anymal")
    contacts = make_contacts(m, FEET, baumgarte_time_step=0.04)
    qw = jnp.array([0, 0, 0, 25000.0, 25000.0, 25000.0] + [0.0001] * 12)
    vw = jnp.array([100.0] * 6 + [1.0] * 12)
    cost = make_config_cost(m, q_ref=Q0, q_weight=qw, v_weight=vw,
                            a_weight=1e-6, u_weight=1e-1,
                            q_weight_terminal=qw, v_weight_terminal=vw)
    lim = make_joint_limits(m, u_limit=jnp.full(12, 80.0),
                            v_limit=jnp.full(12, 15.0))
    Rw, pw = forward_kinematics(m, Q0)
    plc = np.stack([np.asarray(frame_placement(m, m.frame_id(f), Rw, pw)[1])
                    for f in FEET])
    sched = ContactSchedule(nc=4).init([True] * 4, plc)
    N = 4
    grid = discretize(sched, 0.0, 0.025 * N, N)
    sol0 = OS.make_initial_solution(m, contacts, lim, 1e-3, grid, Q0,
                                    jnp.zeros(18))

    B = 16
    key = jax.random.PRNGKey(0)
    dq = 0.02 * jax.random.normal(key, (B, 18))
    q0s = jax.vmap(lambda d: rm.integrate(m, Q0, d))(dq)
    v0s = jnp.zeros((B, 18))
    sols = par.broadcast_solution(sol0, B)

    # single-device batched
    upd_local = par.make_batched_update(m, contacts, lim, (cost,), grid,
                                        n_imp=0, max_iter=2)
    sols_a, kkt_a = upd_local(sols, q0s, v0s)

    # sharded over the 8-device mesh
    mesh = par.scenario_mesh(8)
    upd_sharded = par.make_batched_update(m, contacts, lim, (cost,), grid,
                                          n_imp=0, max_iter=2,
                                          mesh=mesh)
    sols_s = par.shard_scenarios(mesh, sols)
    q0s_s = par.shard_scenarios(mesh, q0s)
    v0s_s = par.shard_scenarios(mesh, v0s)
    sols_b, kkt_b = upd_sharded(sols_s, q0s_s, v0s_s)

    assert np.allclose(np.asarray(kkt_a), np.asarray(kkt_b), rtol=1e-10)
    assert np.allclose(np.asarray(sols_a.q), np.asarray(sols_b.q),
                       atol=1e-10)
    kmax, kmean = par.fleet_kkt_error(kkt_b)
    assert np.isfinite(kmax) and kmax >= kmean


@pytest.mark.slow
def test_sharded_full_solve_matches_single_device():
    """FULL Newton solves (while_loop to tolerance) sharded over the
    8-device mesh equal the single-device solves, and converge
    (round-1 review item #10: multi-chip beyond a 1-update smoke test)."""
    m = load_robot("anymal")
    contacts = make_contacts(m, FEET, baumgarte_time_step=0.04)
    qw = jnp.array([0, 0, 0, 25000.0, 25000.0, 25000.0] + [0.0001] * 12)
    vw = jnp.array([100.0] * 6 + [1.0] * 12)
    cost = make_config_cost(m, q_ref=Q0, q_weight=qw, v_weight=vw,
                            a_weight=1e-6, u_weight=1e-1,
                            q_weight_terminal=qw, v_weight_terminal=vw)
    lim = make_joint_limits(m, u_limit=jnp.full(12, 80.0),
                            v_limit=jnp.full(12, 15.0))
    Rw, pw = forward_kinematics(m, Q0)
    plc = np.stack([np.asarray(frame_placement(m, m.frame_id(f), Rw, pw)[1])
                    for f in FEET])
    sched = ContactSchedule(nc=4).init([True] * 4, plc)
    N = 4
    grid = discretize(sched, 0.0, 0.025 * N, N)
    sol0 = OS.make_initial_solution(m, contacts, lim, 1e-3, grid, Q0,
                                    jnp.zeros(18))
    B = 8
    key = jax.random.PRNGKey(1)
    dq = 0.02 * jax.random.normal(key, (B, 18))
    q0s = jax.vmap(lambda d: rm.integrate(m, Q0, d))(dq)
    v0s = jnp.zeros((B, 18))
    sols = par.broadcast_solution(sol0, B)

    def full_solve(sol, q0, v0):
        new, stats = OS._solve(m, contacts, lim, 30, 1e-8, 1e-3, 0.995,
                               0, (cost,), sol, grid, q0, v0)
        return new.q, stats["kkt_error"], stats["iterations"]

    q_a, kkt_a, it_a = jax.jit(jax.vmap(full_solve))(sols, q0s, v0s)

    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = par.scenario_mesh(8)
    shard = NamedSharding(mesh, P("dp"))
    q_b, kkt_b, it_b = jax.jit(
        jax.vmap(full_solve),
        in_shardings=(shard, shard, shard))(
        par.shard_scenarios(mesh, sols), par.shard_scenarios(mesh, q0s),
        par.shard_scenarios(mesh, v0s))
    # every scenario converged, sharded == single-device
    assert np.all(np.asarray(kkt_a) < 1e-8)
    np.testing.assert_allclose(np.asarray(kkt_b), np.asarray(kkt_a),
                               rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(np.asarray(q_b), np.asarray(q_a),
                               atol=1e-10)
