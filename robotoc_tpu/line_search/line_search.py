"""Merit-function backtracking line search for the contact OCP.

Reference: src/line_search/line_search.cpp:29-120 + line_search_settings.hpp
(reduction rate 0.75, min step 0.05). Each trial integrates a primal-only
candidate and re-evaluates the OCP (cost + barrier + l1 feasibility) — the
cheap evaluation pass below mirrors the reference's `evalOCP` (no
derivatives). The loop is a `lax.while_loop`, so the whole search stays
inside the jitted update.

Merit: phi(alpha) = cost + barrier + penalty * primal_feasibility_l1, with
the l1-penalty weight taken from the current duals' magnitude (exact-penalty
style). Accept on simple decrease; bail at alpha_min.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..constraints import friction_cone as fc
from ..constraints import joint_limits as jl
from ..constraints import pdipm
from ..costs import base as cost_base
from ..dynamics import state_equation as se
from ..models import contacts as ct
from ..models import robot as rm


def eval_ocp(model, contacts, limits, barrier, costs, sol, grid,
             q_init, v_init):
    """(total cost+barrier, l1 primal feasibility) at the iterate.
    Intermediate-stage physics only (impact slots contribute their
    state-equation gap, which dominates infeasibility there)."""

    def stage(t, dt, q, v, a, u, f, q_n, v_n, s_lim, s_cone, cmask, p_ref,
              fric, is_imp, R_ref):
        rowmask = contacts.force_mask(cmask)
        f_eff = f * rowmask
        fj = ct.contact_forces_to_joint(model, contacts, f_eff)
        Sact_u = jnp.concatenate(
            [jnp.zeros(model.nv - model.dimu, q.dtype), u])
        ID = rm.rnea(model, q, v, a, fj) - Sact_u
        C = ct.baumgarte_residual(model, contacts, q, v, a, p_ref,
                                  R_ref) * rowmask
        _, _, xres_q = se.linearize(model, q, v, dt, q_n)
        Fv = v + dt * a - v_n
        c = cost_base.eval_stage(costs, model, q, v, a, u, f, t, dt)
        e_lim = jl.constraint_values(model, limits, q, v, u, a)
        g_cone, _, _ = fc.residual_and_jac(model, contacts, q, f_eff, fric)
        cone_mask = contacts.cone_mask(cmask).astype(bool)
        bar = (pdipm.log_barrier(s_lim, barrier, limits.mask)
               + pdipm.log_barrier(s_cone, barrier, cone_mask))
        viol = (jnp.sum(jnp.abs(xres_q)) + jnp.sum(jnp.abs(Fv))
                + (1.0 - is_imp) * (jnp.sum(jnp.abs(ID))
                                    + jnp.sum(jnp.abs(C)))
                + (1.0 - is_imp) * (
                    jnp.sum(jnp.abs(pdipm.residual(e_lim, s_lim,
                                                   limits.mask)))
                    + jnp.sum(jnp.abs(pdipm.residual(g_cone, s_cone,
                                                     cone_mask)))))
        return (1.0 - is_imp) * (c + bar), viol

    cs, viols = jax.vmap(stage)(
        grid.t[:-1], grid.dt, sol.q[:-1], sol.v[:-1], sol.a[:-1],
        sol.u[:-1], sol.f[:-1], sol.q[1:], sol.v[1:], sol.s_lim, sol.s_cone,
        grid.contact_mask[:-1], grid.p_ref[:-1], grid.friction[:-1],
        grid.is_impact[:-1], grid.R_ref[:-1])
    cN = cost_base.eval_terminal(costs, model, sol.q[-1], sol.v[-1],
                                 grid.t[-1])
    dq0 = rm.difference(model, sol.q[0], q_init)
    viol0 = jnp.sum(jnp.abs(dq0)) + jnp.sum(jnp.abs(v_init - sol.v[0]))
    return jnp.sum(cs) + cN, jnp.sum(viols) + viol0


MAX_FILTER = 32


def empty_filter(dtype=jnp.float64):
    """Fixed-size Fletcher-Leyffer filter; +inf rows are empty slots
    (reference line_search_filter.hpp:14-81 — there a dynamic set; here a
    static array carried through the jitted solve loop)."""
    return jnp.full((MAX_FILTER, 2), jnp.inf, dtype=dtype)


def filter_accepts(filt, cost, viol, cost_rate=0.005, viol_rate=0.005):
    """(cost, viol) is acceptable if ANY filter entry's condition holds —
    improve that entry's cost by its margin OR improve its violation
    (reference line_search_filter.cpp isAccepted: loop returns true on the
    first entry satisfying either condition; an EMPTY filter accepts).
    Empty slots in the static array are (+inf, +inf) and are masked out
    (inf - inf = NaN would poison the comparison otherwise)."""
    finite = jnp.isfinite(filt[:, 1])
    ok = ((cost < filt[:, 0] - cost_rate * filt[:, 1])
          | (viol < (1.0 - viol_rate) * filt[:, 1]))
    return jnp.any(finite & ok) | ~jnp.any(finite)


def filter_augment(filt, it, cost, viol):
    """Insert the accepted pair (round-robin over the static slots).
    Non-finite pairs (failed trial evaluation) are dropped — a NaN entry
    would permanently reject every future trial (NaN comparisons are
    always false)."""
    entry_ok = jnp.isfinite(cost) & jnp.isfinite(viol)
    new = filt.at[it % MAX_FILTER].set(
        jnp.asarray([cost, viol], filt.dtype))
    return jnp.where(entry_ok, new, filt)


def filter_search(trial_fn, eval_fn, alpha_max, filt,
                  reduction=0.75, alpha_min=0.05):
    """Backtrack to the largest step acceptable to the filter.
    eval_fn(sol) -> (cost+barrier, l1 violation). Returns
    (alpha, cost, viol) at the accepted trial."""

    def measure(alpha):
        c, v = eval_fn(trial_fn(alpha))
        return c, v

    c0, v0 = measure(alpha_max)

    def cond(state):
        alpha, c, v = state
        return (~filter_accepts(filt, c, v)) & (alpha > alpha_min)

    def body(state):
        alpha, _, _ = state
        new_alpha = alpha * reduction
        c, v = measure(new_alpha)
        return new_alpha, c, v

    return jax.lax.while_loop(cond, body, (alpha_max, c0, v0))


def search(trial_fn, merit_fn, alpha_max, reduction=0.75, alpha_min=0.05,
           margin=0.0):
    """Backtrack: largest alpha = alpha_max * reduction^k whose merit
    improves on the current one. trial_fn(alpha) -> candidate solution;
    merit_fn(sol) -> scalar."""
    phi0 = merit_fn(trial_fn(0.0))

    def cond(state):
        alpha, phi, _ = state
        return (phi > phi0 - margin) & (alpha > alpha_min)

    def body(state):
        alpha, _, _ = state
        new_alpha = alpha * reduction
        phi = merit_fn(trial_fn(new_alpha))
        return new_alpha, phi, phi

    phi_first = merit_fn(trial_fn(alpha_max))
    alpha, _, _ = jax.lax.while_loop(
        cond, body, (alpha_max, phi_first, phi_first))
    return alpha
