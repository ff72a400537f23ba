"""UnconstrOCPSolver convergence tests (reference:
test/solver/unconstr_ocp_solver_test.cpp + examples/iiwa14/config_space_ocp)."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from robotoc_tpu.constraints.joint_limits import make_joint_limits
from robotoc_tpu.costs.config_cost import make_config_cost
from robotoc_tpu.models import load_robot
from robotoc_tpu.solver.unconstr_ocp_solver import (SolverOptions,
                                                    UnconstrOCPSolver)


import functools


@functools.lru_cache(maxsize=1)
def _problem(N=20, T=1.0):
    m = load_robot("iiwa14")
    q_ref = jnp.array([0, math.pi / 2, 0, math.pi / 2, 0, math.pi / 2, 0])
    cost = make_config_cost(m, q_ref=q_ref, q_weight=10, v_weight=0.01,
                            a_weight=0.01, q_weight_terminal=10,
                            v_weight_terminal=0.01)
    lim = make_joint_limits(m, u_limit=jnp.full(7, 50.0),
                            v_limit=jnp.full(7, math.pi / 2))
    solver = UnconstrOCPSolver(m, cost, lim, T=T, N=N)
    q0 = jnp.array([math.pi / 2, 0, math.pi / 2, 0, math.pi / 2, 0,
                    math.pi / 2])
    v0 = jnp.zeros(7)
    return solver, q0, v0


def test_converges_to_kkt_tol():
    solver, q0, v0 = _problem()
    sol, stats = solver.solve(q0, v0)
    assert float(stats["kkt_error"]) < 1e-7
    assert int(stats["iterations"]) < 30
    # initial state matched
    np.testing.assert_allclose(sol.q[0], q0, atol=1e-8)
    np.testing.assert_allclose(sol.v[0], v0, atol=1e-8)


def test_constraints_satisfied():
    solver, q0, v0 = _problem()
    sol, _ = solver.solve(q0, v0)
    assert float(jnp.abs(sol.u[:-1]).max()) <= 50.0 + 1e-6
    assert float(jnp.abs(sol.v).max()) <= math.pi / 2 + 1e-6
    q_lo, q_hi = solver.model.q_lower, solver.model.q_upper
    assert bool(jnp.all(sol.q >= q_lo - 1e-6))
    assert bool(jnp.all(sol.q <= q_hi + 1e-6))


def test_dynamics_feasibility_at_solution():
    """At convergence u must equal RNEA(q, v, a) and the state equation must
    hold: the multiple-shooting gaps close."""
    from robotoc_tpu.models import rnea
    solver, q0, v0 = _problem()
    sol, _ = solver.solve(q0, v0)
    m, dt = solver.model, solver.dt
    ID = rnea(m, sol.q[:-1], sol.v[:-1], sol.a[:-1])
    np.testing.assert_allclose(ID, sol.u[:-1], atol=1e-7)
    np.testing.assert_allclose(sol.q[:-1] + dt * sol.v[:-1], sol.q[1:],
                               atol=1e-7)
    np.testing.assert_allclose(sol.v[:-1] + dt * sol.a[:-1], sol.v[1:],
                               atol=1e-7)


def test_warm_start_converges_fast():
    solver, q0, v0 = _problem()
    sol, _ = solver.solve(q0, v0)
    sol2, stats2 = solver.solve(q0, v0, sol=sol)
    assert int(stats2["iterations"]) <= 1


def test_unconstr_line_search_converges():
    """Filter line search (reference unconstr_line_search.cpp:37-70):
    enabling it still converges to the same tolerance and backtracks on a
    poor initial guess instead of diverging."""
    import math
    from robotoc_tpu.models import load_robot
    from robotoc_tpu.costs.config_cost import make_config_cost
    from robotoc_tpu.constraints.joint_limits import make_joint_limits
    from robotoc_tpu.solver.unconstr_ocp_solver import (SolverOptions,
                                                        UnconstrOCPSolver)

    m = load_robot("iiwa14")
    q_ref = jnp.asarray([0, math.pi / 2, 0, math.pi / 2, 0,
                         math.pi / 2, 0], m.dtype)
    cost = make_config_cost(m, q_ref=q_ref, q_weight=10, v_weight=0.01,
                            a_weight=0.01, u_weight=0.0,
                            q_weight_terminal=10, v_weight_terminal=0.01)
    lim = make_joint_limits(m, u_limit=jnp.full(7, 50.0),
                            v_limit=jnp.full(7, math.pi / 2))
    q0 = jnp.asarray([math.pi / 2, 0, math.pi / 2, 0, math.pi / 2, 0,
                      math.pi / 2], m.dtype)
    s_ls = UnconstrOCPSolver(m, cost, lim, T=3.0, N=20,
                             options=SolverOptions(enable_line_search=True))
    sol, st = s_ls.solve(q0, jnp.zeros(7))
    assert bool(st["convergence"])
    assert float(st["kkt_error"]) < 1e-7


def test_parnmpc_line_search_converges():
    import math
    from robotoc_tpu.models import load_robot
    from robotoc_tpu.costs.config_cost import make_config_cost
    from robotoc_tpu.constraints.joint_limits import make_joint_limits
    from robotoc_tpu.parnmpc.solver import (SolverOptions,
                                            UnconstrParNMPCSolver)

    m = load_robot("iiwa14")
    q_ref = jnp.asarray([0, math.pi / 2, 0, math.pi / 2, 0,
                         math.pi / 2, 0], m.dtype)
    cost = make_config_cost(m, q_ref=q_ref, q_weight=10, v_weight=0.01,
                            a_weight=0.01, u_weight=0.0,
                            q_weight_terminal=10, v_weight_terminal=0.01)
    lim = make_joint_limits(m, u_limit=jnp.full(7, 50.0),
                            v_limit=jnp.full(7, math.pi / 2))
    q0 = jnp.asarray([math.pi / 2, 0, math.pi / 2, 0, math.pi / 2, 0,
                      math.pi / 2], m.dtype)
    s_ls = UnconstrParNMPCSolver(
        m, cost, lim, T=1.0, N=20,
        options=SolverOptions(enable_line_search=True, max_iter=60,
                              kkt_tol=1e-6))
    sol, st = s_ls.solve(q0, jnp.zeros(7))
    assert float(st["kkt_error"]) < 1e-6
    assert not st["numerical_failure"]
