"""OCPSolver: whole-body optimal control with contacts and a floating base.

TPU-native counterpart of the reference's flagship solver
(reference: include/robotoc/solver/ocp_solver.hpp:41,
src/solver/ocp_solver.cpp:10-493). One Newton update = one XLA computation:
batched stage evaluation+condensing (vmap over grids), scan-Riccati, batched
expansion, fraction-to-boundary, manifold update. The contact schedule enters
as per-grid ARRAYS (planner/contact_sequence.py) so MPC re-discretization
never recompiles.

v1 scope: grid-based discretization, intermediate+terminal stages (impact
stages land next), joint limits + friction cones, fixed barrier parameter.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..constraints import friction_cone as fc
from ..constraints import joint_limits as jl
from ..constraints import pdipm
from ..core.structs import LQRData
from ..costs import base as cost_base
from ..models import contacts as ct
from ..models import robot as rm
from ..ocp import contact_stage as stage
from ..ocp import impact_stage as istage
from ..planner.contact_sequence import GridData
from ..riccati import lqr
from ..riccati import parallel as plqr


@struct.dataclass
class Solution:
    """Horizon-stacked primal-dual iterate for the contact OCP
    (reference core/split_solution.hpp:87-169, stacked)."""
    q: jnp.ndarray        # (N+1, nq)
    v: jnp.ndarray        # (N+1, nv)
    a: jnp.ndarray        # (N+1, nv)
    u: jnp.ndarray        # (N+1, dimu)
    f: jnp.ndarray        # (N+1, nf)
    lmd: jnp.ndarray      # (N+1, nv)
    gmm: jnp.ndarray      # (N+1, nv)
    beta: jnp.ndarray     # (N+1, nv)
    mu: jnp.ndarray       # (N+1, nf)
    s_lim: jnp.ndarray    # (N, 6*dimu)
    z_lim: jnp.ndarray
    s_cone: jnp.ndarray   # (N, 5*nc)
    z_cone: jnp.ndarray


@struct.dataclass
class SolverOptions:
    max_iter: int = struct.field(pytree_node=False, default=100)
    kkt_tol: float = struct.field(pytree_node=False, default=1e-7)
    barrier: float = struct.field(pytree_node=False, default=1e-3)
    fraction_to_boundary_rule: float = struct.field(
        pytree_node=False, default=0.995)
    parallel_riccati: bool = struct.field(pytree_node=False, default=False)
    """Use the O(log N)-depth associative-scan Riccati
    (riccati/parallel.py) instead of the serial scan."""
    enable_line_search: bool = struct.field(pytree_node=False, default=False)
    """Merit-backtracking line search (reference line_search/)."""


class OCPSolver:
    def __init__(self, model: rm.RobotModel, contacts: ct.ContactModel,
                 costs,
                 limits: Optional[jl.JointLimits], T: float, N: int,
                 options: SolverOptions = SolverOptions(),
                 n_reserved_events: int = 0):
        self.model = model
        self.contacts = contacts
        self.costs = tuple(costs) if isinstance(
            costs, (tuple, list)) else (costs,)
        self.limits = limits if limits is not None \
            else jl.make_joint_limits(model)
        self.T, self.N = float(T), int(N)
        self.n_reserved_events = int(n_reserved_events)
        self.n_slots = self.N + 1 + self.n_reserved_events
        self.options = options
        ei = self.n_reserved_events > 0
        global_lqr = plqr if options.parallel_riccati else lqr
        self._lqr = global_lqr
        # `costs` is a call-time pytree argument: the MPC layer swaps
        # reference arrays every update without recompiling.
        self._solve = jax.jit(functools.partial(
            _solve, model, contacts, self.limits,
            options.max_iter, options.kkt_tol, options.barrier,
            options.fraction_to_boundary_rule, ei,
            riccati=global_lqr,
            enable_ls=options.enable_line_search))
        self._update = jax.jit(functools.partial(
            _update, model, contacts, self.limits,
            options.barrier, options.fraction_to_boundary_rule, ei,
            riccati=global_lqr,
            enable_ls=options.enable_line_search))
        self._kkt_error = jax.jit(functools.partial(
            _kkt_error, model, contacts, self.limits,
            options.barrier, ei))

    def init_solution(self, grid: GridData, q, v,
                      f_init: Optional[jnp.ndarray] = None) -> Solution:
        """Warm start: constant (q, v), forces distributing the weight over
        active contacts (reference mpc_* init pattern)."""
        return make_initial_solution(self.model, self.contacts, self.limits,
                                     self.options.barrier, grid, q, v,
                                     f_init)

    def solve(self, grid: GridData, q_init, v_init,
              sol: Optional[Solution] = None, costs=None):
        if sol is None:
            sol = self.init_solution(grid, q_init, v_init)
        q_init = jnp.asarray(q_init, self.model.dtype)
        v_init = jnp.asarray(v_init, self.model.dtype)
        return self._solve(costs or self.costs, sol, grid, q_init, v_init)

    def update(self, grid: GridData, q_init, v_init, sol: Solution,
               costs=None):
        """One Newton update (MPC mode)."""
        return self._update(costs or self.costs, sol, grid,
                            jnp.asarray(q_init), jnp.asarray(v_init))

    def kkt_error(self, grid: GridData, q_init, v_init, sol: Solution,
                  costs=None):
        return float(self._kkt_error(costs or self.costs, sol, grid,
                                     jnp.asarray(q_init),
                                     jnp.asarray(v_init)))


# ---------------------------------------------------------------------------

def make_initial_solution(model, contacts, limits, barrier,
                          grid: GridData, q, v,
                          f_init: Optional[jnp.ndarray] = None) -> Solution:
    """Constant-(q, v) warm start; stance forces share the robot's weight;
    PDIPM slacks/duals initialized strictly feasible
    (reference: initConstraints / mpc_* init pattern)."""
    m = model
    n1 = grid.n_slots
    nf = contacts.max_dimf
    dtype = m.dtype
    q = jnp.broadcast_to(jnp.asarray(q, dtype), (n1, m.nq))
    v = jnp.broadcast_to(jnp.asarray(v, dtype), (n1, m.nv))
    znv = jnp.zeros((n1, m.nv), dtype)
    if f_init is None:
        # distribute weight: mg / n_active on each active contact (z)
        n_active = jnp.maximum(jnp.sum(grid.contact_mask, axis=1), 1.0)
        fz = m.total_mass * 9.81 / n_active
        f_init = jnp.zeros((n1, nf), dtype)
        offs = contacts.f_offsets
        for c in range(contacts.n_contacts):
            f_init = f_init.at[:, offs[c] + 2].set(
                fz * grid.contact_mask[:, c])
    sol = Solution(q=q, v=v, a=znv, u=jnp.zeros((n1, m.dimu), dtype),
                   f=f_init, lmd=znv, gmm=znv, beta=znv,
                   mu=jnp.zeros((n1, nf), dtype),
                   s_lim=jnp.zeros((n1 - 1, 0), dtype),
                   z_lim=jnp.zeros((n1 - 1, 0), dtype),
                   s_cone=jnp.zeros((n1 - 1, 0), dtype),
                   z_cone=jnp.zeros((n1 - 1, 0), dtype))
    return reinit_constraints(model, contacts, limits, barrier, grid, sol)


def reinit_constraints(model, contacts, limits, barrier, grid: GridData,
                       sol: Solution) -> Solution:
    """(Re-)initialize the PDIPM slack/dual variables from the current
    primal iterate (reference dms_.initConstraints, called at solver init
    and after every mesh refinement, ocp_solver.cpp:164,196)."""
    m = model
    e_lim = jl.constraint_values(m, limits, sol.q[:-1], sol.v[:-1],
                                 sol.u[:-1])
    s_lim, z_lim = pdipm.init_slack_dual(e_lim, barrier, limits.mask)
    cone_mask = jax.vmap(contacts.cone_mask)(grid.contact_mask[:-1]) > 0
    f_mask = jax.vmap(contacts.force_mask)(grid.contact_mask[:-1])
    g_cone = jax.vmap(
        lambda qq, ff, fr: fc.residual_and_jac(
            m, contacts, qq, ff, fr)[0])(
        sol.q[:-1], sol.f[:-1] * f_mask,
        grid.friction[:-1])
    s_cone, z_cone = pdipm.init_slack_dual(g_cone, barrier, cone_mask)
    return sol.replace(s_lim=s_lim, z_lim=z_lim, s_cone=s_cone,
                       z_cone=z_cone)


def _build(model, contacts, limits, barrier, enable_impacts,
           costs, sol: Solution, grid: GridData, q_init, v_init):
    dt = grid.dt
    fn = jax.vmap(functools.partial(
        stage.stage_eval, model, contacts, costs, limits))
    blocks = fn(grid.t[:-1], dt, jnp.full_like(dt, barrier),
                sol.q[:-1], sol.v[:-1], sol.a[:-1], sol.u[:-1], sol.f[:-1],
                sol.beta[:-1], sol.mu[:-1], sol.lmd[:-1], sol.gmm[:-1],
                sol.lmd[1:], sol.gmm[1:], sol.q[1:], sol.v[1:],
                sol.s_lim, sol.z_lim, sol.s_cone, sol.z_cone,
                grid.contact_mask[:-1], grid.p_ref[:-1], grid.friction[:-1],
                grid.R_ref[:-1])
    if enable_impacts:
        ifn = jax.vmap(functools.partial(
            istage.stage_eval, model, contacts, costs, limits))
        iblocks = ifn(grid.t[:-1], dt, jnp.full_like(dt, barrier),
                      sol.q[:-1], sol.v[:-1], sol.a[:-1], sol.u[:-1],
                      sol.f[:-1], sol.beta[:-1], sol.mu[:-1], sol.lmd[:-1],
                      sol.gmm[:-1], sol.lmd[1:], sol.gmm[1:],
                      sol.q[1:], sol.v[1:],
                      sol.s_lim, sol.z_lim, sol.s_cone, sol.z_cone,
                      grid.imp_mask[:-1], grid.p_ref[:-1],
                      grid.friction[:-1])
        flag = grid.is_impact[:-1]
        blocks = jax.tree.map(
            lambda a, b: jnp.where(
                flag.reshape((-1,) + (1,) * (a.ndim - 1)) > 0, a, b),
            iblocks, blocks)
    tq = cost_base.quadratize_terminal(costs, model, sol.q[-1],
                                       sol.v[-1], grid.t[-1])
    cN = tq.cost
    lxN = jnp.concatenate([tq.lq - sol.lmd[-1], tq.lv - sol.gmm[-1]])
    zb = jnp.zeros_like(tq.Qqq)
    QxxN = jnp.block([[tq.Qqq, zb], [zb, tq.Qvv]])
    data = LQRData(A=blocks.A, B=blocks.B, xres=blocks.xres,
                   Qxx=blocks.Qxx, Qxu=blocks.Qxu, Quu=blocks.Quu,
                   lx=blocks.lx, lu=blocks.lu, Qxx_N=QxxN, lx_N=lxN)
    dq0 = rm.difference(model, sol.q[0], q_init)
    dx0 = jnp.concatenate([dq0, v_init - sol.v[0]])
    kkt_sq = (jnp.sum(blocks.kkt_sq) + jnp.sum(lxN**2) + jnp.sum(dx0**2))
    total_cost = jnp.sum(blocks.cost) + cN
    return data, blocks, dx0, kkt_sq, total_cost


class Directions(NamedTuple):
    """Full primal-dual Newton direction, expanded from the LQR solve."""
    dq_all: jnp.ndarray
    dv_all: jnp.ndarray
    da: jnp.ndarray
    du: jnp.ndarray
    df: jnp.ndarray
    dlmd: jnp.ndarray
    dgmm: jnp.ndarray
    dbeta: jnp.ndarray
    dmu: jnp.ndarray
    ds_lim: jnp.ndarray
    dz_lim: jnp.ndarray
    ds_cone: jnp.ndarray
    dz_cone: jnp.ndarray
    cone_mask: jnp.ndarray


def _expand_directions(model, contacts, limits, barrier, enable_impacts,
                       blocks, sol: Solution, grid: GridData,
                       dx, du, dlmd_all) -> Directions:
    """Recover (da, df, dbeta, dmu, slack/dual dirs) for every grid from the
    LQR directions (reference expandPrimal/expandDual, OMP loop
    direct_multiple_shooting.cpp) — one vmapped kernel."""
    nv = model.nv
    dq, dv = dx[:-1, :nv], dx[:-1, nv:]
    dqN, dvN = dx[-1, :nv], dx[-1, nv:]
    dlmd, dgmm = dlmd_all[:, :nv], dlmd_all[:, nv:]
    exp = jax.vmap(functools.partial(
        stage.expand, model, contacts, limits, barrier))
    (da, df, dbeta, dmu, ds_lim, dz_lim, ds_cone, dz_cone, cone_mask) = exp(
        blocks, dq, dv, du, sol.gmm[1:] + dgmm[1:], grid.dt,
        sol.f[:-1], sol.beta[:-1], sol.mu[:-1],
        sol.s_lim, sol.z_lim, sol.s_cone, sol.z_cone,
        grid.contact_mask[:-1], grid.friction[:-1], sol.q[:-1])
    if enable_impacts:
        iexp = jax.vmap(functools.partial(
            istage.expand, model, contacts, barrier))
        (ida, idf, idbeta, idmu, ids_cone, idz_cone) = iexp(
            blocks, dq, dv, sol.gmm[1:] + dgmm[1:],
            sol.f[:-1], sol.beta[:-1], sol.mu[:-1],
            sol.s_cone, sol.z_cone, grid.imp_mask[:-1],
            grid.friction[:-1], sol.q[:-1])
        flag = grid.is_impact[:-1]

        def sel(a, b):
            return jnp.where(
                flag.reshape((-1,) + (1,) * (a.ndim - 1)) > 0, a, b)

        da = sel(ida, da)
        df = sel(idf, df)
        dbeta = sel(idbeta, dbeta)
        dmu = sel(idmu, dmu)
        ds_cone = sel(ids_cone, ds_cone)
        dz_cone = sel(idz_cone, dz_cone)
        du = sel(jnp.zeros_like(du), du)
        ds_lim = sel(jnp.zeros_like(ds_lim), ds_lim)
        dz_lim = sel(jnp.zeros_like(dz_lim), dz_lim)
        cone_mask = cone_mask | (
            jax.vmap(contacts.cone_mask)(grid.imp_mask[:-1]) > 0)
    dq_all = jnp.concatenate([dq, dqN[None]], axis=0)
    dv_all = jnp.concatenate([dv, dvN[None]], axis=0)
    return Directions(dq_all=dq_all, dv_all=dv_all, da=da, du=du, df=df,
                      dlmd=dlmd, dgmm=dgmm, dbeta=dbeta, dmu=dmu,
                      ds_lim=ds_lim, dz_lim=dz_lim, ds_cone=ds_cone,
                      dz_cone=dz_cone, cone_mask=cone_mask)


def _step_sizes(limits, ftb, sol: Solution, d: Directions):
    """Fraction-to-boundary primal/dual step sizes."""
    a_p = jnp.minimum(
        pdipm.fraction_to_boundary(sol.s_lim, d.ds_lim, ftb, limits.mask),
        pdipm.fraction_to_boundary(sol.s_cone, d.ds_cone, ftb, d.cone_mask))
    a_d = jnp.minimum(
        pdipm.fraction_to_boundary(sol.z_lim, d.dz_lim, ftb, limits.mask),
        pdipm.fraction_to_boundary(sol.z_cone, d.dz_cone, ftb, d.cone_mask))
    return a_p, a_d


def _pad0(x):
    return jnp.concatenate(
        [x, jnp.zeros((1,) + x.shape[1:], x.dtype)], axis=0)


def _integrate_solution(model, sol: Solution, d: Directions, a_p, a_d):
    """Manifold primal update + dual update with separate step sizes
    (reference updatePrimal/updateDual)."""
    return Solution(
        q=rm.integrate(model, sol.q, a_p * d.dq_all),
        v=sol.v + a_p * d.dv_all,
        a=sol.a + a_p * _pad0(d.da),
        u=sol.u + a_p * _pad0(d.du),
        f=sol.f + a_p * _pad0(d.df),
        lmd=sol.lmd + a_p * d.dlmd,
        gmm=sol.gmm + a_p * d.dgmm,
        beta=sol.beta + a_p * _pad0(d.dbeta),
        mu=sol.mu + a_p * _pad0(d.dmu),
        s_lim=sol.s_lim + a_p * d.ds_lim,
        z_lim=sol.z_lim + a_d * d.dz_lim,
        s_cone=sol.s_cone + a_p * d.ds_cone,
        z_cone=sol.z_cone + a_d * d.dz_cone,
    )


def _update(model, contacts, limits, barrier, ftb, enable_impacts,
            costs, sol: Solution, grid: GridData, q_init, v_init,
            riccati=lqr, enable_ls=False):
    data, blocks, dx0, kkt_sq, _ = _build(model, contacts, limits,
                                          barrier, enable_impacts, costs,
                                          sol, grid, q_init, v_init)
    dx, du, dlmd_all, policy = riccati.solve(data, dx0)
    d = _expand_directions(model, contacts, limits, barrier, enable_impacts,
                           blocks, sol, grid, dx, du, dlmd_all)
    (da, df, dbeta, dmu, ds_lim, dz_lim, ds_cone, dz_cone) = (
        d.da, d.df, d.dbeta, d.dmu, d.ds_lim, d.dz_lim, d.ds_cone,
        d.dz_cone)
    du = d.du
    dlmd, dgmm = d.dlmd, d.dgmm
    a_p, a_d = _step_sizes(limits, ftb, sol, d)
    dq_all, dv_all = d.dq_all, d.dv_all
    pad0_ls = _pad0
    if enable_ls is True or enable_ls == "merit":
        from ..line_search import line_search as ls

        def trial(alpha):
            return sol.replace(
                q=rm.integrate(model, sol.q, alpha * dq_all),
                v=sol.v + alpha * dv_all,
                a=sol.a + alpha * pad0_ls(da),
                u=sol.u + alpha * pad0_ls(du),
                f=sol.f + alpha * pad0_ls(df),
                s_lim=sol.s_lim + alpha * ds_lim,
                s_cone=sol.s_cone + alpha * ds_cone)

        rho = 1.0 + jnp.max(jnp.abs(sol.lmd)) + jnp.max(jnp.abs(sol.gmm)) \
            + jnp.max(jnp.abs(sol.beta)) + jnp.max(jnp.abs(sol.mu))

        def merit(s):
            c, v = ls.eval_ocp(model, contacts, limits, barrier, costs, s,
                               grid, q_init, v_init)
            return c + rho * v

        a_p = ls.search(trial, merit, a_p)
    if enable_ls == "kkt":
        # KKT-residual backtracking: accept the largest step that reduces
        # the FULL nonlinear KKT norm. More expensive per trial (one stage
        # re-evaluation) but globally monotone — needed on strongly
        # nonlinear problems (jumps) where the Gauss-Newton model (same
        # curvature drops as the reference) turns full steps into a limit
        # cycle near the solution.
        def kkt_at(ap, ad):
            trial_sol = _integrate_solution(model, sol, d, ap, ad)
            _, _, _, k_sq, _ = _build(model, contacts, limits, barrier,
                                      enable_impacts, costs, trial_sol,
                                      grid, q_init, v_init)
            return k_sq

        def cond(state):
            scale, k_trial, it = state
            return (k_trial >= kkt_sq) & (it < 8)

        def body(state):
            scale, _, it = state
            scale = 0.5 * scale
            return scale, kkt_at(scale * a_p, scale * a_d), it + 1

        k_full = kkt_at(a_p, a_d)
        scale, _, _ = jax.lax.while_loop(
            cond, body, (jnp.ones_like(a_p), k_full, jnp.asarray(0)))
        a_p = scale * a_p
        a_d = scale * a_d
    new = _integrate_solution(model, sol, d, a_p, a_d)
    return new, jnp.sqrt(kkt_sq), a_p, policy


def _kkt_error(model, contacts, limits, barrier, enable_impacts,
               costs, sol, grid, q_init, v_init):
    _, _, _, kkt_sq, _ = _build(model, contacts, limits, barrier,
                                enable_impacts, costs, sol, grid, q_init,
                                v_init)
    return jnp.sqrt(kkt_sq)


def _solve(model, contacts, limits, max_iter, kkt_tol, barrier, ftb,
           enable_impacts, costs, sol, grid, q_init, v_init, riccati=lqr):
    def cond(state):
        _, it, kkt, _ = state
        return (it < max_iter) & (kkt > kkt_tol)

    def body(state):
        s, it, _, _ = state
        new, _, alpha, _ = _update(model, contacts, limits, barrier, ftb,
                                   enable_impacts, costs, s, grid, q_init,
                                   v_init, riccati=riccati)
        kkt = _kkt_error(model, contacts, limits, barrier,
                         enable_impacts, costs, new, grid, q_init, v_init)
        return new, it + 1, kkt, alpha

    kkt0 = _kkt_error(model, contacts, limits, barrier,
                      enable_impacts, costs, sol, grid, q_init, v_init)
    one = jnp.asarray(1.0, sol.q.dtype)
    sol, iters, kkt, alpha = jax.lax.while_loop(
        cond, body, (sol, jnp.asarray(0), kkt0, one))
    return sol, dict(iterations=iters, kkt_error=kkt, last_step_size=alpha)


def align_solution(sol: Solution, old_grid: GridData,
                   new_grid: GridData) -> Solution:
    """Warm-start re-alignment across re-discretizations: map every new slot
    to the nearest old slot of the same kind and gather the old solution
    rows (reference: solver/solution_interpolator.cpp:21-76, with
    impact-grid alignment at :46-52). Host-side index computation, one
    device gather."""
    import numpy as np
    t_old = np.asarray(old_grid.t)
    t_new = np.asarray(new_grid.t)
    imp_old = np.asarray(old_grid.is_impact) > 0
    imp_new = np.asarray(new_grid.is_impact) > 0
    S = t_new.shape[0]
    idx = np.zeros(S, dtype=np.int32)
    for i in range(S):
        same = np.where(imp_old == imp_new[i])[0]
        if len(same) == 0:
            same = np.arange(t_old.shape[0])
        idx[i] = same[np.argmin(np.abs(t_old[same] - t_new[i]))]
    idx_full = jnp.asarray(idx)
    idx_stage = jnp.asarray(np.minimum(idx[:-1], t_old.shape[0] - 2))

    def g_full(x):
        return jnp.take(x, idx_full, axis=0)

    def g_stage(x):
        return jnp.take(x, idx_stage, axis=0)

    return Solution(
        q=g_full(sol.q), v=g_full(sol.v), a=g_full(sol.a), u=g_full(sol.u),
        f=g_full(sol.f), lmd=g_full(sol.lmd), gmm=g_full(sol.gmm),
        beta=g_full(sol.beta), mu=g_full(sol.mu),
        s_lim=g_stage(sol.s_lim), z_lim=g_stage(sol.z_lim),
        s_cone=g_stage(sol.s_cone), z_cone=g_stage(sol.z_cone))
