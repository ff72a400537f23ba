"""Pallas condensing kernels vs the vmapped JAX condense path.

The Pallas path (ops/pallas_condense) must reproduce the JAX condensing
(ocp/contact_stage.condense_jax) on the flagship trot problem — impact
slots, friction cones, switching constraints — including under the fleet
vmap, where the custom-vmap rule flattens (B, N) into the lane axis.
Runs in interpreter mode on CPU (the compiled path is exercised on TPU by
bench.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robotoc_tpu.models import load_robot
from robotoc_tpu.models import robot as rm
from robotoc_tpu.mpc.mpc_trot import MPCTrot
from robotoc_tpu.solver import ocp_solver as OS


@pytest.fixture(scope="module")
def trot_problem():
    m = load_robot("anymal")
    T, N = 0.5, 10
    mpc = MPCTrot(m, T=T, N=N)
    planner = mpc.make_planner()
    planner.set_gait_pattern(np.array([0.15, 0, 0]), 0.0)
    mpc.set_gait_pattern(planner, swing_height=0.1, swing_time=0.25,
                         stance_time=0.0, swing_start_time=0.5)
    q0 = jnp.asarray([0, 0, 0.4792, 0, 0, 0, 1, -0.1, 0.7, -1.0,
                      -0.1, -0.7, 1.0, 0.1, 0.7, -1.0, 0.1, -0.7, 1.0],
                     m.dtype)
    v0 = jnp.zeros(18, m.dtype)
    mpc.planner.init(q0)
    mpc.config_cost = mpc.config_cost.replace(q_ref=q0)
    grid, costs = mpc._build_schedule_and_costs(0.35, q0, v0)
    solver = OS.OCPSolver(m, mpc.contacts, costs, mpc.limits, T=T, N=N,
                          n_reserved_events=mpc.n_reserved)
    sol = solver.init_solution(grid, q0, v0)
    # a non-trivial iterate: one Newton update from the warm start
    sol, _, _, _ = solver.update(grid, q0, v0, sol)
    return m, mpc, costs, grid, sol, q0, v0


def _build_both(m, mpc, costs, grid, sol, q0, v0):
    args = (m, mpc.contacts, mpc.limits, 1e-3, mpc.n_reserved, costs,
            sol, grid, q0, v0)
    ref = OS._build(*args, enable_sw=True, use_pallas=False)
    pal = OS._build(*args, enable_sw=True, use_pallas=True)
    return ref, pal


def test_build_matches_jax(trot_problem):
    m, mpc, costs, grid, sol, q0, v0 = trot_problem
    ref, pal = jax.jit(
        lambda s: _build_both(m, mpc, costs, grid, s, q0, v0))(sol)
    data_r, blocks_r = ref[0], ref[1]
    data_p, blocks_p = pal[0], pal[1]
    for name in ("A", "B", "xres", "Qxx", "Qxu", "Quu", "lx", "lu",
                 "Qxx_N", "lx_N", "Phix", "Phiu", "Pc", "sw"):
        a, b = getattr(data_r, name), getattr(data_p, name)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-9, atol=1e-9, err_msg=name)
    for name in ("G", "c0", "inv11", "inv12", "Sinv", "Hy", "Cwy"):
        a, b = getattr(blocks_r, name), getattr(blocks_p, name)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-9, atol=1e-9, err_msg=name)
    np.testing.assert_allclose(float(pal[3]), float(ref[3]), rtol=1e-9)


def test_update_matches_under_fleet_vmap(trot_problem):
    """The custom-vmap flatten: a batched _update through the Pallas path
    equals the JAX path scenario-by-scenario."""
    m, mpc, costs, grid, sol, q0, v0 = trot_problem
    B = 3
    sols = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), sol)
    key = jax.random.PRNGKey(0)
    dq = 0.05 * jax.random.normal(key, (B, 18), m.dtype)
    q0s = jax.vmap(lambda d: rm.integrate(m, q0, d))(dq)
    v0s = jnp.zeros((B, 18), m.dtype)

    def upd(use_pallas, s, qq, vv):
        new, kkt, alpha, _ = OS._update(
            m, mpc.contacts, mpc.limits, 1e-3, 0.995, mpc.n_reserved,
            costs, s, grid, qq, vv, enable_sw=True, use_pallas=use_pallas)
        return new, kkt, alpha

    ref = jax.jit(jax.vmap(lambda s, a, b: upd(False, s, a, b)))(
        sols, q0s, v0s)
    pal = jax.jit(jax.vmap(lambda s, a, b: upd(True, s, a, b)))(
        sols, q0s, v0s)
    np.testing.assert_allclose(np.asarray(pal[1]), np.asarray(ref[1]),
                               rtol=1e-8)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-7, atol=1e-8),
        ref[0], pal[0])
