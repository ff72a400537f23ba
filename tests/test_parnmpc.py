"""UnconstrParNMPCSolver convergence + agreement with UnconstrOCPSolver
(reference: test/solver/unconstr_parnmpc_solver_test.cpp,
examples/iiwa14/unconstr_parnmpc_benchmark.cpp)."""
import functools
import math

import jax.numpy as jnp
import numpy as np

from robotoc_tpu.constraints.joint_limits import make_joint_limits
from robotoc_tpu.costs.config_cost import make_config_cost
from robotoc_tpu.models import load_robot
from robotoc_tpu.parnmpc.solver import UnconstrParNMPCSolver
from robotoc_tpu.solver.unconstr_ocp_solver import UnconstrOCPSolver


@functools.lru_cache(maxsize=1)
def _problem(N=20, T=1.0):
    m = load_robot("iiwa14")
    q_ref = jnp.array([0, math.pi / 2, 0, math.pi / 2, 0, math.pi / 2, 0])
    cost = make_config_cost(m, q_ref=q_ref, q_weight=10, v_weight=0.01,
                            a_weight=0.01, q_weight_terminal=10,
                            v_weight_terminal=0.01)
    lim = make_joint_limits(m, u_limit=jnp.full(7, 50.0),
                            v_limit=jnp.full(7, math.pi / 2))
    q0 = jnp.array([math.pi / 2, 0, math.pi / 2, 0, math.pi / 2, 0,
                    math.pi / 2])
    v0 = jnp.zeros(7)
    return m, cost, lim, q0, v0, N, T


def test_parnmpc_converges():
    m, cost, lim, q0, v0, N, T = _problem()
    solver = UnconstrParNMPCSolver(m, cost, lim, T=T, N=N)
    sol, stats = solver.solve(q0, v0)
    assert stats["kkt_error"] < 1e-7, stats
    assert stats["iterations"] < 60


def test_parnmpc_matches_riccati_solver():
    m, cost, lim, q0, v0, N, T = _problem()
    pn = UnconstrParNMPCSolver(m, cost, lim, T=T, N=N)
    sol_p, _ = pn.solve(q0, v0)
    rc = UnconstrOCPSolver(m, cost, lim, T=T, N=N)
    sol_r, _ = rc.solve(q0, v0)
    # Stage i of ParNMPC owns grid i+1. The two solvers use forward vs
    # backward Euler (as in the reference: unconstr_state_equation
    # evalForwardEuler vs evalBackwardEuler), so trajectories agree only to
    # O(dt) discretization error.
    dt = T / N
    np.testing.assert_allclose(sol_p.q, sol_r.q[1:], atol=5.0 * dt)
    # initial transient differs most (velocity-limit saturation enters one
    # grid earlier/later); compare after it settles
    np.testing.assert_allclose(sol_p.v[3:], sol_r.v[4:], atol=5.0 * dt)
    # terminal states agree to discretization error
    np.testing.assert_allclose(sol_p.q[-1], sol_r.q[-1], atol=2.0 * dt)
