"""OCP solver with switching-time optimization (STO).

TPU-native counterpart of the reference's STO-enabled OCPSolver path
(reference: src/solver/ocp_solver.cpp:148-225 with sto_cost/sto_constraints,
src/sto/switching_time_optimization.cpp:43-212, and the STO branches of the
Riccati recursion, src/riccati/riccati_factorizer.cpp:93-175). The algorithm
here reaches the same coupled Newton step through a different, TPU-first
factorization:

  * the phase-based grid makes every (t_i, dt_i) LINEAR in the switching
    times ts (sto/discretization.py), so ts is a traced input of ONE jitted
    update — moving event times never recompiles;
  * the switching-time gradient lt = dL/dts is produced by `jax.linearize`
    of the condensed stage pipeline (the reference's per-grid Hamiltonian
    rows h/hx/hu emerge automatically as the tangents of (cost, lx, lu,
    xres) wrt ts);
  * the coupled KKT system over (directions, dts) is block-eliminated with a
    Schur complement on the tiny dts block: the block-tridiagonal system is
    solved for E+1 right-hand sides (base residual + E cross-derivative
    columns) with ONE Riccati factorization and a batched vector sweep
    (riccati/lqr.py solve_columns) — replacing the reference's handcrafted
    psi/phi/xi/chi/rho/eta recursion with exact linear algebra;
  * minimum-dwell-time PDIPM (sto/constraints.py) and the reference's
    trust-region clip `max_dts_riccati` (solver_options.hpp:133) and initial
    STO regularization schedule (solver_options.hpp:96-107) are preserved;
  * mesh refinement (ocp_solver.cpp:184-199): when the KKT error drops below
    `kkt_tol_mesh` and the largest dt exceeds `max_dt_mesh`, the per-phase
    grid counts are re-allocated from the current ts and the solution is
    re-aligned (align_solution) — one recompile, like the reference's
    re-discretization.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct

from ..planner.contact_sequence import ContactSchedule
from ..riccati import lqr
from ..sto import constraints as dwell
from ..sto import cost as sto_cost_mod
from ..sto.discretization import PhaseDiscretization
from . import ocp_solver as OS


@struct.dataclass
class STOSolverOptions:
    max_iter: int = struct.field(pytree_node=False, default=200)
    kkt_tol: float = struct.field(pytree_node=False, default=1e-7)
    kkt_tol_mesh: float = struct.field(pytree_node=False, default=0.1)
    max_dt_mesh: float = struct.field(pytree_node=False, default=0.0)
    """Mesh-refinement trigger; <=0 disables refinement."""
    barrier: float = struct.field(pytree_node=False, default=1e-3)
    fraction_to_boundary_rule: float = struct.field(
        pytree_node=False, default=0.995)
    initial_sto_reg_iter: int = struct.field(pytree_node=False, default=0)
    initial_sto_reg: float = struct.field(pytree_node=False, default=1e30)
    max_dts: float = struct.field(pytree_node=False, default=0.1)
    """Trust-region clip on the switching-time step
    (reference max_dts_riccati)."""


class OCPSolverSTO:
    """Whole-body OCP solver over a phase-based grid with the switching
    times as decision variables."""

    def __init__(self, model, contacts, costs, limits,
                 schedule: ContactSchedule, t0: float, T: float, N: int,
                 sto_costs=(), min_dwell_times=None,
                 options: STOSolverOptions = STOSolverOptions(),
                 switching_constraints: bool = True,
                 cost_update_fn=None):
        """switching_constraints: impose the pure-state touchdown
        constraint on every impact-bearing horizon, as the reference does
        unconditionally (reference time_discretization.cpp:138-142,
        intermediate_stage.cpp:124, switching_constraint.cpp:7-62).

        Convergence caveat: with the constraint active, aggressive jumps
        whose optimal flight time pushes a phase duration against the
        minimum-dwell bound can cycle (the Gauss-Newton dts step pins at
        the PDIPM boundary and the compressed horizon re-expands next
        iteration). If `solve` reports no convergence and the ts history
        oscillates at the dwell bound, pass switching_constraints=False
        (the pre-round-4 behavior) or raise the relevant min dwell time."""
        self.model, self.contacts = model, contacts
        self.costs = tuple(costs) if isinstance(costs, (tuple, list)) \
            else (costs,)
        self.cost_update_fn = cost_update_fn
        """Optional JAX-TRACEABLE ts -> costs hook evaluated INSIDE the
        STO linearization. Phase-indexed references
        (DiscreteTimeSwingFootRef / DiscreteTimeCoMRef) must follow the
        moving phase boundaries the way the reference's grid-info-keyed
        refs do (discrete_time_swing_foot_ref.cpp:52-78) — refs baked at
        fixed times fight the dts step with their full task weight and
        the Gauss-Newton iteration cycles; evaluating the hook on the
        traced ts makes the dts direction see the exact d(cost)/d(ts)
        including the reference motion. Must be pure jnp ops (no
        np.asarray / float on ts) returning the SAME pytree structure
        each call."""
        self.sto_costs = tuple(sto_costs)
        self.limits = limits
        self.options = options
        self.schedule = schedule
        self.enable_sw = bool(switching_constraints)
        self.t0, self.T, self.N = float(t0), float(T), int(N)
        self.disc = PhaseDiscretization(schedule, t0, T, N,
                                        dtype=model.dtype)
        if min_dwell_times is None:
            min_dwell_times = np.full(self.disc.P,
                                      float(np.sqrt(np.finfo(float).eps)))
        self.dwell_con = dwell.make_dwell_constraint(
            min_dwell_times, barrier=options.barrier,
            ftb=options.fraction_to_boundary_rule, dtype=model.dtype)
        self._make_jits(self.disc)

    def _make_jits(self, disc: PhaseDiscretization):
        o = self.options
        sw = self.enable_sw and disc.n_impact_slots > 0
        self._upd = jax.jit(functools.partial(
            _sto_update, self.model, self.contacts, self.limits,
            o.barrier, o.fraction_to_boundary_rule, disc, self.dwell_con,
            o.max_dts, enable_sw=sw,
            cost_update_fn=self.cost_update_fn))
        self._kkt = jax.jit(functools.partial(
            _sto_kkt_error, self.model, self.contacts, self.limits,
            o.barrier, disc, self.dwell_con, enable_sw=sw,
            cost_update_fn=self.cost_update_fn))

    def init_solution(self, q, v, ts=None,
                      f_init: Optional[jnp.ndarray] = None):
        ts = self.disc.ts0 if ts is None else ts
        grid = self.disc.grid(jnp.asarray(ts, self.model.dtype))
        return OS.make_initial_solution(self.model, self.contacts,
                                        self.limits, self.options.barrier,
                                        grid, q, v, f_init)

    def solve(self, q_init, v_init, sol=None, verbose=False, ts=None,
              freeze_ts=False):
        """Full solve with STO regularization schedule + mesh refinement.
        Returns (sol, ts, stats dict).

        ts: warm-start switching times (default: the schedule's nominal
        times). freeze_ts: keep the switching times fixed (the STO
        regularization stays at initial_sto_reg for every iteration) —
        used to polish the TRAJECTORY at already-optimized times, e.g.
        after a trust-region STO phase on many coupled events
        (examples/anymal_trot_sto.py)."""
        o = self.options
        disc = self.disc
        dtype = self.model.dtype
        ts = jnp.asarray(disc.ts0 if ts is None else ts, dtype)
        q_init = jnp.asarray(q_init, dtype)
        v_init = jnp.asarray(v_init, dtype)
        if sol is None:
            sol = self.init_solution(q_init, v_init, ts)
        dw = dwell.dwell_times(ts, disc.t0, disc.T, dtype)
        st = dwell.init_state(self.dwell_con, dw)
        stats = dict(iterations=0, kkt_error=np.inf, convergence=False,
                     ts_history=[np.asarray(ts)], mesh_refinements=0)
        inner = 0
        for it in range(o.max_iter):
            reg = o.initial_sto_reg \
                if (inner < o.initial_sto_reg_iter or freeze_ts) else 0.0
            # ONE build per iteration: the update returns the KKT error of
            # its INPUT iterate (same single-build pattern as the Riccati
            # solve loop); convergence triggers one step late, which only
            # tightens the returned solution.
            sol, ts, st, kkt_in, alpha = self._upd(
                self.costs, self.sto_costs, sol, ts, st, q_init, v_init,
                jnp.asarray(reg, dtype))
            kkt = float(kkt_in)
            stats["ts_history"].append(np.asarray(ts))
            stats["iterations"] = it + 1
            stats["kkt_error"] = kkt
            if verbose:
                print(f"iter {it}: kkt={kkt:.3e} alpha={float(alpha):.3f} "
                      f"ts={np.asarray(ts)}")
            if kkt < o.kkt_tol_mesh and o.max_dt_mesh > 0 \
                    and disc.max_time_step(ts) > o.max_dt_mesh:
                new_disc = disc.refine(ts)
                sol = OS.align_solution(sol, disc.grid(ts),
                                        new_disc.grid(ts),
                                        model=self.model)
                grid = new_disc.grid(ts)
                sol = OS.reinit_constraints(self.model, self.contacts,
                                            self.limits, o.barrier, grid,
                                            sol)
                dw = dwell.dwell_times(ts, new_disc.t0, new_disc.T, dtype)
                st = dwell.init_state(self.dwell_con, dw)
                disc = new_disc
                self.disc = new_disc
                self._make_jits(new_disc)
                stats["mesh_refinements"] += 1
                inner = 0
                continue
            if kkt < o.kkt_tol:
                stats["convergence"] = True
                break
            inner += 1
        # report the FINAL iterate's KKT error (the loop measure is the
        # input-iterate one from the single-build update)
        kkt_final = float(self._kkt(self.costs, self.sto_costs, sol, ts,
                                    st, q_init, v_init))
        stats["kkt_error"] = kkt_final
        if kkt_final < o.kkt_tol:
            stats["convergence"] = True
        return sol, ts, stats


# ---------------------------------------------------------------------------

def _linearized_build(model, contacts, limits, barrier, disc, costs, sol,
                      q_init, v_init, ts, enable_sw=False,
                      cost_update_fn=None):
    """Primal build + tangent columns of (xres, lx, lu, [Pc,] Lagrangian)
    wrt the switching times: one traced primal, E cheap tangent replays.
    With enable_sw the switching-constraint residual rows Pc and the
    xi^T P term of the Lagrangian ride the same jax.linearize — the
    reference's Phit rows (switching_constraint.cpp:56-60) emerge as the
    ts-tangents of the condensed rows."""
    n_imp = disc.n_impact_slots

    def fbuild(ts_):
        grid = disc.grid(ts_)
        # phase-indexed references follow the moving boundaries INSIDE
        # the linearization, so the dts direction sees the exact
        # d(cost)/d(ts) including the reference motion — without it the
        # dts Hessian underestimates the curvature of strongly-weighted
        # tracking costs and the Gauss-Newton step overshoots/cycles
        costs_ = costs if cost_update_fn is None else cost_update_fn(ts_)
        data, blocks, dx0, kkt_sq, total_cost, sw_aux = OS._build(
            model, contacts, limits, barrier, n_imp, costs_, sol,
            grid, q_init, v_init, enable_sw=enable_sw)
        lam = jnp.concatenate([sol.lmd[1:], sol.gmm[1:]], axis=1)
        scalar = total_cost + jnp.sum(lam * data.xres) \
            + sw_aux["lagrangian"]
        Pc = data.Pc if enable_sw else jnp.zeros((), ts_.dtype)
        return (data.xres, data.lx, data.lu, Pc, scalar), \
            (data, blocks, dx0, kkt_sq)

    (xres0, lx0, lu0, Pc0, scalar0), lin, aux = jax.linearize(
        fbuild, ts, has_aux=True)
    E = ts.shape[0]
    eye = jnp.eye(E, dtype=ts.dtype)
    tangents = [lin(eye[k]) for k in range(E)]
    S_xres = jnp.stack([t[0] for t in tangents], axis=1)   # (S-1, E, nx)
    S_lx = jnp.stack([t[1] for t in tangents], axis=1)
    S_lu = jnp.stack([t[2] for t in tangents], axis=1)
    S_Pc = jnp.stack([t[3] for t in tangents], axis=1) if enable_sw \
        else None                                          # (S-1, E, nf)
    lt_dyn = jnp.stack([t[4] for t in tangents])            # (E,)
    return aux, S_xres, S_lx, S_lu, S_Pc, lt_dyn


def _sto_update(model, contacts, limits, barrier, ftb,
                disc: PhaseDiscretization, dwell_con, max_dts,
                costs, sto_costs, sol, ts, st: dwell.DwellState,
                q_init, v_init, sto_reg, enable_sw=False,
                cost_update_fn=None):
    """One coupled Newton update on (solution, switching times)."""
    dtype = sol.q.dtype
    E = disc.E
    mask = disc.sto_mask

    (data, blocks, dx0, kkt_sq), S_xres, S_lx, S_lu, S_Pc, lt_dyn = \
        _linearized_build(model, contacts, limits, barrier, disc, costs,
                          sol, q_init, v_init, ts, enable_sw=enable_sw,
                          cost_update_fn=cost_update_fn)

    # ---- base Riccati solve + E cross-derivative columns ----------------
    policy = lqr.backward(data)
    dx, du, dlmd_all = lqr.forward(data, policy, dx0)
    nx = data.lx_N.shape[0]
    Zdx, Zdu, Zdlmd, Zdxi = lqr.solve_columns(
        data, policy, S_lx, S_lu, S_xres,
        jnp.zeros((E, nx), dtype), jnp.zeros((E, nx), dtype), Pc_b=S_Pc)

    # ---- STO cost + dwell-time PDIPM ------------------------------------
    _, lt_sto, Qtt_sto = sto_cost_mod.quadratize(sto_costs, ts)
    dw = dwell.dwell_times(ts, disc.t0, disc.T, dtype)
    lt_dw, Qtt_dw, r_dw, cmpl_dw, _ = dwell.linearize_condense(
        dwell_con, st, dw)
    lt = lt_dyn + lt_sto + lt_dw
    Qtt = Qtt_sto + Qtt_dw + (sto_reg + 1e-9) * jnp.eye(E, dtype=dtype)

    # ---- Schur complement on dts ----------------------------------------
    lt_red = lt + (jnp.einsum("iek,ik->e", S_lx, dx[:-1])
                   + jnp.einsum("iek,ik->e", S_lu, du)
                   + jnp.einsum("iek,ik->e", S_xres, dlmd_all[1:]))
    Qcross = (jnp.einsum("iek,ilk->el", S_lx, Zdx[:-1])
              + jnp.einsum("iek,ilk->el", S_lu, Zdu)
              + jnp.einsum("iek,ilk->el", S_xres, Zdlmd[1:]))
    if enable_sw and policy.Mx is not None:
        # switching-multiplier response: the ts-tangents of the condensed
        # constraint rows couple to dxi exactly as xres couples to dlmd
        dxi_base = (jnp.einsum("nfx,nx->nf", policy.Mx, dx[:-1])
                    + policy.mx) * data.sw
        lt_red = lt_red + jnp.einsum("iek,ik->e", S_Pc, dxi_base)
        Qcross = Qcross + jnp.einsum("iek,ilk->el", S_Pc, Zdxi)
    Qtt_red = Qtt + 0.5 * (Qcross + Qcross.T)
    mm = mask[:, None] * mask[None, :]
    Qtt_red = Qtt_red * mm + jnp.diag(1.0 - mask)
    # Levenberg-style curvature guard per eigenmode — the reference's `sgm`
    # regularization generalized to E switching times
    # (riccati_factorizer.cpp:159-162): whenever the mode's Newton step
    # would exceed max_dts or its curvature is non-positive, inflate the
    # curvature to |sgm| + |g|/max_dts, bounding the step by max_dts while
    # keeping a descent model.
    evals, evecs = jnp.linalg.eigh(Qtt_red)
    g_modes = evecs.T @ (lt_red * mask)
    eps_c = 1e-9
    bad = (evals * max_dts < jnp.abs(g_modes)) | (evals < eps_c)
    evals = jnp.where(bad, jnp.abs(evals) + jnp.abs(g_modes) / max_dts
                      + eps_c, evals)
    dts = -(evecs @ (g_modes / evals)) * mask
    # numerical-failure guard (mirrors the solver's dir_ok zeroing): a
    # non-finite switching-time direction must not poison ts — the
    # solution step below still proceeds at the unmoved grid
    dts = jnp.where(jnp.isfinite(dts), dts, 0.0)

    # ---- apply: move the switching times, then take the solution step at
    # the MOVED grid. The dts direction anticipates the solution's response
    # (exact Schur complement above); taking the solution step from a fresh
    # linearization at ts_new exactly compensates the eliminated variables'
    # (a, f, beta, mu) explicit dt-dependence — the role of the reference's
    # STO-sensitivity condensing (contact_dynamics.cpp:156-163 haf rows).
    dslack, ddual = dwell.expand(dwell_con, st, dw, dts)
    ap_dw, ad_dw = dwell.step_sizes(dwell_con, st, dslack, ddual)
    a_ts = ap_dw
    ts_new = ts + a_ts * dts
    st_new = dwell.DwellState(slack=st.slack + a_ts * dslack,
                              dual=st.dual + jnp.minimum(a_ts, ad_dw)
                              * ddual)

    # solution Newton step at the moved grid, with the KKT-residual
    # backtracking (globally monotone on the OCP rows at fixed ts_new)
    costs_new = costs if cost_update_fn is None else cost_update_fn(ts_new)
    new_sol, _, a_p, _ = OS._update(model, contacts, limits, barrier, ftb,
                                    disc.n_impact_slots, costs_new, sol,
                                    disc.grid(ts_new),
                                    q_init, v_init, enable_ls="kkt",
                                    enable_sw=enable_sw)

    lt_kkt = (lt_dyn + lt_sto + dwell_con.J.T @ st.dual) * mask
    kkt_total = (kkt_sq + jnp.sum(lt_kkt ** 2)
                 + jnp.sum(r_dw ** 2) + jnp.sum(cmpl_dw ** 2))
    return new_sol, ts_new, st_new, jnp.sqrt(kkt_total), a_p


def _sto_kkt_error(model, contacts, limits, barrier,
                   disc: PhaseDiscretization, dwell_con,
                   costs, sto_costs, sol, ts, st, q_init, v_init,
                   enable_sw=False, cost_update_fn=None):
    """KKT error including switching-time stationarity (the reference's
    Hamiltonian-continuity terms, switching_time_optimization.cpp:120-136)
    and dwell-time PDIPM residuals."""
    dtype = sol.q.dtype

    def scalar_fn(ts_):
        grid = disc.grid(ts_)
        costs_ = costs if cost_update_fn is None else cost_update_fn(ts_)
        data, _, _, kkt_sq, total_cost, sw_aux = OS._build(
            model, contacts, limits, barrier, disc.n_impact_slots, costs_,
            sol, grid, q_init, v_init, enable_sw=enable_sw)
        lam = jnp.concatenate([sol.lmd[1:], sol.gmm[1:]], axis=1)
        return (total_cost + jnp.sum(lam * data.xres)
                + sw_aux["lagrangian"]), kkt_sq

    (_, kkt_sq), lt_dyn = jax.value_and_grad(scalar_fn, has_aux=True)(ts)
    _, lt_sto, _ = sto_cost_mod.quadratize(sto_costs, ts)
    dw = dwell.dwell_times(ts, disc.t0, disc.T, dtype)
    r_dw = dwell_con.min_dwell - dw + st.slack
    cmpl_dw = st.slack * st.dual - dwell_con.barrier
    lt = (lt_dyn + lt_sto + dwell_con.J.T @ st.dual) * disc.sto_mask
    return jnp.sqrt(kkt_sq + jnp.sum(lt ** 2) + jnp.sum(r_dw ** 2)
                    + jnp.sum(cmpl_dw ** 2))
