"""Barrier parameter path-following (reference solver_options.hpp:38-65:
mu_init, mu_min, kkt_tol_mu, linear/superlinear decrease).

Cold-start ANYmal standing solve driven from mu=1e-2 down to mu=1e-5,
converging to kkt_tol at the final barrier — plus SolverStatistics
population (VERDICT round-2 items #5 and #10).
"""
import jax.numpy as jnp
import numpy as np

from robotoc_tpu.constraints.joint_limits import make_joint_limits
from robotoc_tpu.costs.config_cost import make_config_cost
from robotoc_tpu.models import forward_kinematics, frame_placement, load_robot
from robotoc_tpu.models.contacts import make_contacts
from robotoc_tpu.planner.contact_sequence import ContactSchedule, discretize
from robotoc_tpu.solver.ocp_solver import OCPSolver, SolverOptions


def _standing_problem(options, N=6):
    m = load_robot("anymal")
    feet = ["LF_FOOT", "LH_FOOT", "RF_FOOT", "RH_FOOT"]
    contacts = make_contacts(m, feet, baumgarte_time_step=0.04)
    q0 = jnp.asarray([0, 0, 0.4792, 0, 0, 0, 1, -0.1, 0.7, -1.0,
                      -0.1, -0.7, 1.0, 0.1, 0.7, -1.0, 0.1, -0.7, 1.0])
    qw = jnp.asarray([0, 0, 0, 250000, 250000, 250000] + [0.0001] * 12)
    vw = jnp.asarray([100.0] * 6 + [1.0] * 12)
    cost = make_config_cost(m, q_ref=q0, q_weight=qw, v_weight=vw,
                            a_weight=1e-6, u_weight=1e-1,
                            q_weight_terminal=qw, v_weight_terminal=vw)
    lim = make_joint_limits(m, u_limit=jnp.full(12, 80.0),
                            v_limit=jnp.full(12, 15.0))
    Rw, pw = forward_kinematics(m, q0)
    plc = np.stack([np.asarray(frame_placement(m, m.frame_id(f), Rw, pw)[1])
                    for f in feet])
    sched = ContactSchedule(nc=4).init([True] * 4, plc)
    T = 0.025 * N
    grid = discretize(sched, 0.0, T, N)
    solver = OCPSolver(m, contacts, (cost,), lim, T=T, N=N, options=options)
    return solver, grid, q0, jnp.zeros(18)


def test_barrier_path_following_converges():
    opts = SolverOptions(max_iter=30, kkt_tol=1e-7, barrier=1e-2,
                         mu_min=1e-5, kkt_tol_mu=1e-4,
                         mu_linear_decrease_factor=0.2,
                         mu_superlinear_decrease_power=1.5)
    solver, grid, q0, v0 = _standing_problem(opts)
    sol, st, stats = solver.solve(grid, q0, v0, statistics=True)
    assert bool(st["convergence"]), st
    assert float(st["kkt_error"]) < 1e-7
    # the mu path actually descended to mu_min
    assert stats.barrier[0] == 1e-2
    assert np.isclose(stats.barrier[-1], 1e-5)
    assert len(stats.barrier) >= 3
    # per-iteration history was recorded and ends at the converged KKT
    assert stats.iter == len(stats.kkt_error) > 0
    assert stats.kkt_error[-1] < 1e-7
    assert all(np.isfinite(k) for k in stats.kkt_error)
    assert stats.convergence
    assert stats.cpu_time > 0.0


def test_fixed_barrier_default_unchanged():
    # mu_min == barrier (defaults): single stage, same result as _solve
    opts = SolverOptions(max_iter=30, kkt_tol=1e-7)
    solver, grid, q0, v0 = _standing_problem(opts)
    sol, st = solver.solve(grid, q0, v0)
    assert bool(st["convergence"])
    sol2, st2, stats = solver.solve(grid, q0, v0, statistics=True)
    assert bool(st2["convergence"])
    assert stats.barrier == [1e-3]
    assert float(jnp.max(jnp.abs(sol.q - sol2.q))) < 1e-12
