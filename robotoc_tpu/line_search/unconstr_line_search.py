"""Filter line search for the unconstr (fixed-base) pipeline.

Reference: include/robotoc/line_search/unconstr_line_search.hpp:29 +
src/line_search/unconstr_line_search.cpp:37-70 — a Fletcher-Leyffer filter
over (cost + barrier, l1 primal feasibility): each trial step integrates a
primal-only candidate and re-runs the cheap OCP evaluation; backtrack by
`reduction` until the filter accepts or `min_step` is hit. Globalizes
both UnconstrOCPSolver and UnconstrParNMPCSolver, which previously took
raw fraction-to-boundary steps (round-4 verdict Missing #3).

The filter machinery (static-array filter + jitted backtracking loop) is
shared with the contact pipeline (line_search/line_search.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constraints import joint_limits as jl
from ..constraints import pdipm
from ..costs import base as cost_base
from ..models import robot as rm
from .line_search import (empty_filter, filter_augment, filter_search)


def eval_unconstr(model, cost, limits, dt, barrier, t0, sol, q_init,
                  v_init):
    """(cost + log-barrier, l1 primal feasibility) of an unconstr iterate
    — the reference's UnconstrDirectMultipleShooting::evalOCP as used by
    UnconstrLineSearch (unconstr_line_search.cpp:55-58). Works for both
    UnconstrSolution and ParNMPCSolution (same field layout)."""
    N = sol.q.shape[0] - 1
    ts = t0 + dt * jnp.arange(N, dtype=sol.q.dtype)

    def stage(t, q, v, a, u, q_n, v_n, s):
        e_id = rm.rnea(model, q, v, a) - u
        Fq = q + dt * v - q_n
        Fv = v + dt * a - v_n
        c = cost_base.eval_stage(cost, model, q, v, a, u,
                                 jnp.zeros((0,), q.dtype), t, dt)
        e = jl.constraint_values(model, limits, q, v, u, a)
        bar = pdipm.log_barrier(s, barrier, limits.mask)
        viol = (jnp.sum(jnp.abs(Fq)) + jnp.sum(jnp.abs(Fv))
                + jnp.sum(jnp.abs(e_id))
                + jnp.sum(jnp.abs(pdipm.residual(e, s, limits.mask))))
        return c + bar, viol

    cs, viols = jax.vmap(stage)(
        ts, sol.q[:-1], sol.v[:-1], sol.a[:-1], sol.u[:-1],
        sol.q[1:], sol.v[1:], sol.slack)
    cN = cost_base.eval_terminal(cost, model, sol.q[-1], sol.v[-1],
                                 t0 + dt * N)
    viol0 = (jnp.sum(jnp.abs(q_init - sol.q[0]))
             + jnp.sum(jnp.abs(v_init - sol.v[0])))
    return jnp.sum(cs) + cN, jnp.sum(viols) + viol0


def primal_step_size(model, cost, limits, dt, barrier, t0, sol, q_init,
                     v_init, trial_fn, alpha_max, filt, it,
                     reduction=0.75, min_step=0.05):
    """Backtracked primal step size via the filter. `trial_fn(alpha)` must
    return a primal-integrated candidate (q, v, a, u, slack updated).
    Returns (alpha, updated filter). Mirrors
    unconstr_line_search.cpp:37-70: the current iterate seeds an empty
    filter; the accepted trial augments it."""
    c_cur, v_cur = eval_unconstr(model, cost, limits, dt, barrier, t0,
                                 sol, q_init, v_init)
    empty = ~jnp.any(jnp.isfinite(filt[:, 1]))
    filt = jnp.where(empty, filter_augment(filt, it, c_cur, v_cur), filt)

    def eval_fn(s):
        return eval_unconstr(model, cost, limits, dt, barrier, t0, s,
                             q_init, v_init)

    alpha, c_t, v_t = filter_search(trial_fn, eval_fn, alpha_max, filt,
                                    reduction=reduction,
                                    alpha_min=min_step)
    filt = filter_augment(filt, it + 1, c_t, v_t)
    return alpha, filt


__all__ = ["eval_unconstr", "primal_step_size", "empty_filter"]
