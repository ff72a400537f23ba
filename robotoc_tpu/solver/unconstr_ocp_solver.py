"""UnconstrOCPSolver: direct multiple shooting + Riccati for fixed-base,
contact-free robots.

TPU-native counterpart of the reference's UnconstrOCPSolver
(reference: include/robotoc/solver/unconstr_ocp_solver.hpp,
src/solver/unconstr_ocp_solver.cpp:102-118, with the stage pipeline of
src/unconstr/unconstr_intermediate_stage.cpp:25-140 and the inverse-dynamics
condensing of src/dynamics/unconstr_dynamics.cpp:46-105).

Design: the whole horizon is evaluated as ONE batched stage kernel (vmap over
grids — replacing the reference's OpenMP loop), condensed into an LQRData
block system, and solved by the scan-Riccati. A full Newton update is a
single jitted function; solver iterations run under `lax.while_loop` so an
entire `solve()` is one XLA computation with zero host round-trips.

Problem structure per grid i (primal s_i = (q, v, a, u), duals
(lmd, gmm) costates, beta inverse-dynamics multiplier, (s, z) PDIPM pairs):
    state eq:  q_{i+1} = q_i + dt v_i ,  v_{i+1} = v_i + dt a_i
    dynamics:  u_i = ID(q_i, v_i, a_i)       (lifted inverse dynamics)
    constraints: joint position/velocity/torque boxes (PDIPM)
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..constraints import joint_limits as jl
from ..constraints import pdipm
from ..core.structs import LQRData, PerformanceIndex
from ..costs import base as cost_base
from ..costs import config_cost as cc
from ..models import robot as rm
from ..riccati import lqr


@struct.dataclass
class UnconstrSolution:
    """Horizon-stacked primal-dual iterate (N+1 grids; row N terminal)."""
    q: jnp.ndarray      # (N+1, nq)
    v: jnp.ndarray      # (N+1, nv)
    a: jnp.ndarray      # (N+1, nv)   row N unused
    u: jnp.ndarray      # (N+1, nv)   row N unused
    lmd: jnp.ndarray    # (N+1, nv)
    gmm: jnp.ndarray    # (N+1, nv)
    beta: jnp.ndarray   # (N+1, nv)   row N unused
    slack: jnp.ndarray  # (N, dimc)
    dual: jnp.ndarray   # (N, dimc)


@struct.dataclass
class SolverOptions:
    """(reference solver/solver_options.hpp:17-160; subset used here)"""
    max_iter: int = struct.field(pytree_node=False, default=100)
    kkt_tol: float = struct.field(pytree_node=False, default=1e-7)
    barrier: float = struct.field(pytree_node=False, default=1e-3)
    fraction_to_boundary_rule: float = struct.field(
        pytree_node=False, default=0.995)
    enable_line_search: bool = struct.field(pytree_node=False,
                                            default=False)
    """Fletcher-Leyffer filter line search on the primal step (reference
    unconstr_line_search.hpp:29; default off like the reference's
    SolverOptions::enable_line_search)."""
    ls_reduction: float = struct.field(pytree_node=False, default=0.75)
    ls_min_step: float = struct.field(pytree_node=False, default=0.05)


class UnconstrOCPSolver:
    """User-facing solver. Holds the problem definition; all state is
    functional (UnconstrSolution pytrees in/out)."""

    def __init__(self, model: rm.RobotModel, cost,
                 limits: Optional[jl.JointLimits], T: float, N: int,
                 options: SolverOptions = SolverOptions(), t0: float = 0.0):
        assert not model.floating_base, \
            "UnconstrOCPSolver requires a fixed-base robot (reference " \
            "solver/unconstr_ocp_solver.hpp)"
        self.model = model
        # generic cost container: any tuple of cost components
        # (ConfigurationSpaceCost, TaskSpace3D/6DCost, CoMCost, ...)
        self.cost = tuple(cost) if isinstance(cost, (tuple, list)) \
            else (cost,)
        self.t0 = float(t0)
        self.limits = limits if limits is not None else \
            jl.make_joint_limits(model)
        self.T = float(T)
        self.N = int(N)
        self.dt = self.T / self.N
        self.options = options
        self._solve = jax.jit(functools.partial(
            _solve, model, self.cost, self.limits, self.dt, self.N,
            options.max_iter, options.kkt_tol, options.barrier,
            options.fraction_to_boundary_rule, self.t0,
            options.enable_line_search, options.ls_reduction,
            options.ls_min_step))
        self._kkt_error = jax.jit(functools.partial(
            _kkt_error, model, self.cost, self.limits, self.dt,
            options.barrier, self.t0))

    def init_solution(self, q, v) -> UnconstrSolution:
        n1 = self.N + 1
        nv = self.model.nv
        dtype = self.model.dtype
        q = jnp.broadcast_to(jnp.asarray(q, dtype), (n1, self.model.nq))
        v = jnp.broadcast_to(jnp.asarray(v, dtype), (n1, nv))
        z = jnp.zeros((n1, nv), dtype)
        e = jl.constraint_values(self.model, self.limits, q[:-1], v[:-1],
                                 z[:-1, :self.model.dimu], z[:-1])
        s0, z0 = pdipm.init_slack_dual(e, self.options.barrier,
                                       self.limits.mask)
        return UnconstrSolution(q=q, v=v, a=z, u=z, lmd=z, gmm=z, beta=z,
                                slack=s0, dual=z0)

    def solve(self, q_init, v_init, sol: Optional[UnconstrSolution] = None):
        if sol is None:
            sol = self.init_solution(q_init, v_init)
        q_init = jnp.asarray(q_init, self.model.dtype)
        v_init = jnp.asarray(v_init, self.model.dtype)
        sol, stats = self._solve(sol, q_init, v_init)
        return sol, stats

    def kkt_error(self, sol, q_init, v_init):
        return float(self._kkt_error(sol, jnp.asarray(q_init),
                                     jnp.asarray(v_init)))


# ---------------------------------------------------------------------------
# Functional core
# ---------------------------------------------------------------------------

def _stage_eval(model, cost, limits, dt, barrier, t, q, v, a, u, beta,
                lmd, gmm, lmd_n, gmm_n, q_n, v_n, s, z):
    """Everything for one intermediate grid. Returns LQR blocks + expansion
    data + KKT residuals. vmapped over the horizon. `cost` is the generic
    component container (costs/base.py) — any tuple of components."""
    nv = model.nv
    # Inverse dynamics + derivatives (the hot kernel)
    ID = rm.rnea(model, q, v, a)
    e_id = ID - u
    dIDdq, dIDdv, M = rm.rnea_derivatives(model, q, v, a)
    # Cost quadratization (dt-scaled)
    quad = cost_base.quadratize_stage(cost, model, 0, q, v, a, u,
                                      jnp.zeros((0,), q.dtype), t, dt)
    c, lq_c, lv_c, la_c, lu_c = (quad.cost, quad.lq, quad.lv, quad.la,
                                 quad.lu)
    Wq, Wv, Wa, Wu = quad.Qqq, quad.Qvv, quad.Qaa, quad.Quu
    # Constraints (PDIPM)
    e = jl.constraint_values(model, limits, q, v, u, a)
    Hq_d, Hv_d, Hu_d, Ha_d, gq_cd, gv_cd, gu_cd, ga_cd = jl.condense(
        model, limits, e, s, z, barrier)
    zq, zv, zu, za = jl.dual_residual(model, limits, z)
    # State equation residuals
    Fq = q + dt * v - q_n
    Fv = v + dt * a - v_n
    # Full KKT residuals (for the error norm; duals at current iterate)
    lq = lq_c + zq + dIDdq.T @ beta + lmd_n - lmd
    lv = lv_c + zv + dIDdv.T @ beta + dt * lmd_n + gmm_n - gmm
    la = la_c + za + M.T @ beta + dt * gmm_n
    lu = lu_c + zu - beta
    # Condensing of (u, beta): Huu du + gu0 = beta_new.
    # Condensed gradients carry the full dual term J^T z PLUS the PDIPM
    # condensing extra (reference: evalDerivatives adds J^T z, then
    # condenseSlackAndDual adds (z r_p - r_c)/s on top).
    Huu_diag = jnp.diag(Wu) + Hu_d
    gu0 = lu_c + zu + gu_cd
    gID = gu0 + Huu_diag * e_id
    lq_t = lq_c + zq + gq_cd + dIDdq.T @ gID + lmd_n - lmd
    lv_t = lv_c + zv + gv_cd + dIDdv.T @ gID + dt * lmd_n + gmm_n - gmm
    la_t = la_c + za + ga_cd + M.T @ gID + dt * gmm_n
    HJ = Huu_diag[:, None]
    Qqq = Wq + jnp.diag(Hq_d) + dIDdq.T @ (HJ * dIDdq)
    Qqv = dIDdq.T @ (HJ * dIDdv)
    Qqa = dIDdq.T @ (HJ * M)
    Qvv = Wv + jnp.diag(Hv_d) + dIDdv.T @ (HJ * dIDdv)
    Qva = dIDdv.T @ (HJ * M)
    Qaa = Wa + jnp.diag(Ha_d) + M.T @ (HJ * M)
    # LQR blocks over x = (q, v), control = a
    eye = jnp.eye(nv, dtype=q.dtype)
    zero = jnp.zeros_like(eye)
    A = jnp.block([[eye, dt * eye], [zero, eye]])
    B = jnp.concatenate([zero, dt * eye], axis=0)
    Qxx = jnp.block([[Qqq, Qqv], [Qqv.T, Qvv]])
    Qxu = jnp.concatenate([Qqa, Qva], axis=0)
    lx = jnp.concatenate([lq_t, lv_t])
    xres = jnp.concatenate([Fq, Fv])
    # Performance pieces
    prim = (jnp.sum(jnp.abs(Fq)) + jnp.sum(jnp.abs(Fv))
            + jnp.sum(jnp.abs(e_id))
            + jnp.sum(jnp.abs(pdipm.residual(e, s, limits.mask))))
    dual_f = jnp.sum(jnp.abs(pdipm.complementarity(s, z, barrier,
                                                   limits.mask)))
    sq = (jnp.sum(Fq**2) + jnp.sum(Fv**2) + jnp.sum(e_id**2)
          + jnp.sum(lq**2) + jnp.sum(lv**2) + jnp.sum(la**2)
          + jnp.sum(lu**2)
          + jnp.sum(pdipm.residual(e, s, limits.mask)**2)
          + jnp.sum(pdipm.complementarity(s, z, barrier, limits.mask)**2))
    cost_total = c + pdipm.log_barrier(s, barrier, limits.mask)
    aux = dict(e_id=e_id, dIDdq=dIDdq, dIDdv=dIDdv, M=M,
               Huu_diag=Huu_diag, gu0=gu0, e=e)
    perf = dict(cost=c, barrier=pdipm.log_barrier(s, barrier, limits.mask),
                prim=prim, dual=dual_f, sq=sq)
    return (A, B, xres, Qxx, Qxu, Qaa, lx, la_t), aux, perf


def _build_kkt(model, cost, limits, dt, barrier, t0, sol, q_init, v_init):
    N = sol.q.shape[0] - 1
    ts = t0 + dt * jnp.arange(N, dtype=sol.q.dtype)
    stage_fn = jax.vmap(functools.partial(
        _stage_eval, model, cost, limits, dt, barrier))
    blocks, aux, perf = stage_fn(
        ts, sol.q[:-1], sol.v[:-1], sol.a[:-1], sol.u[:-1], sol.beta[:-1],
        sol.lmd[:-1], sol.gmm[:-1], sol.lmd[1:], sol.gmm[1:],
        sol.q[1:], sol.v[1:], sol.slack, sol.dual)
    A, B, xres, Qxx, Qxu, Quu, lx, lu = blocks
    # Terminal stage
    tq = cost_base.quadratize_terminal(cost, model, sol.q[-1], sol.v[-1],
                                       t0 + dt * N)
    cN, lqN, lvN, WqN, WvN = tq.cost, tq.lq, tq.lv, tq.Qqq, tq.Qvv
    lxN = jnp.concatenate([lqN - sol.lmd[-1], lvN - sol.gmm[-1]])
    zb = jnp.zeros_like(WqN)
    QxxN = jnp.block([[WqN, zb], [zb, WvN]])
    data = LQRData(A=A, B=B, xres=xres, Qxx=Qxx, Qxu=Qxu, Quu=Quu,
                   lx=lx, lu=lu, Qxx_N=QxxN, lx_N=lxN)
    dx0 = jnp.concatenate([q_init - sol.q[0], v_init - sol.v[0]])
    perf_idx = PerformanceIndex(
        cost=jnp.sum(perf["cost"]) + cN,
        cost_barrier=jnp.sum(perf["barrier"]),
        primal_feasibility=(jnp.sum(perf["prim"])
                            + jnp.sum(jnp.abs(dx0))),
        dual_feasibility=jnp.sum(perf["dual"]),
        kkt_error=(jnp.sum(perf["sq"]) + jnp.sum(lxN**2)
                   + jnp.sum(dx0**2)))
    return data, aux, perf_idx, dx0


def _update(model, cost, limits, dt, barrier, ftb, t0, sol, q_init, v_init):
    """One full Newton update; returns (new sol, kkt_error_sqrt, alpha)."""
    built = _build_kkt(model, cost, limits, dt, barrier, t0,
                       sol, q_init, v_init)
    return _direction_step(model, limits, barrier, ftb, built, sol)


def _direction_step(model, limits, barrier, ftb, built, sol, ls_ctx=None):
    """Newton direction + step from an existing build (single-build loop
    support, mirroring the contact solver). ls_ctx (optional):
    (cost, dt, t0, q_init, v_init, filt, it, reduction, min_step) — filter
    line search on the primal step (reference unconstr_line_search.cpp:
    37-70); returns the updated filter as a 5th output when given."""
    data, aux, perf, dx0 = built
    dx, da, dlmdgmm, _ = lqr.solve(data, dx0)
    nv = model.nv
    dq, dv = dx[:-1, :nv], dx[:-1, nv:]
    dqN, dvN = dx[-1, :nv], dx[-1, nv:]
    # Expand condensed variables
    du = (jnp.einsum("nij,nj->ni", aux["dIDdq"], dq)
          + jnp.einsum("nij,nj->ni", aux["dIDdv"], dv)
          + jnp.einsum("nij,nj->ni", aux["M"], da) + aux["e_id"])
    dbeta = aux["gu0"] + aux["Huu_diag"] * du - sol.beta[:-1]
    de = jl.constraint_direction(model, limits, dq, dv, du, da)
    ds, dz = pdipm.expand_slack_dual(aux["e"], sol.slack, sol.dual,
                                     barrier, de, limits.mask)
    # Fraction-to-boundary step sizes
    a_p = pdipm.fraction_to_boundary(sol.slack, ds, ftb, limits.mask)
    a_d = pdipm.fraction_to_boundary(sol.dual, dz, ftb, limits.mask)
    dlmd, dgmm = dlmdgmm[:, :nv], dlmdgmm[:, nv:]
    pad = lambda x, last: jnp.concatenate([x, last[None]], axis=0)
    znv = jnp.zeros((model.nv,), dtype=sol.q.dtype)
    filt = None
    if ls_ctx is not None:
        from ..line_search import unconstr_line_search as uls
        cost_c, dt_c, t0_c, qi, vi, filt, it, red, mstep = ls_ctx

        def trial(alpha):
            return sol.replace(
                q=sol.q + alpha * jnp.concatenate([dq, dqN[None]], axis=0),
                v=sol.v + alpha * jnp.concatenate([dv, dvN[None]], axis=0),
                a=sol.a + alpha * pad(da, znv),
                u=sol.u + alpha * pad(du, znv),
                slack=sol.slack + alpha * ds)

        a_p, filt = uls.primal_step_size(
            model, cost_c, limits, dt_c, barrier, t0_c, sol, qi, vi,
            trial, a_p, filt, it, reduction=red, min_step=mstep)
    new = UnconstrSolution(
        q=sol.q + a_p * jnp.concatenate([dq, dqN[None]], axis=0),
        v=sol.v + a_p * jnp.concatenate([dv, dvN[None]], axis=0),
        a=sol.a + a_p * pad(da, znv),
        u=sol.u + a_p * pad(du, znv),
        lmd=sol.lmd + a_p * dlmd,
        gmm=sol.gmm + a_p * dgmm,
        beta=sol.beta + a_p * pad(dbeta, znv),
        slack=sol.slack + a_p * ds,
        dual=sol.dual + a_d * dz,
    )
    if ls_ctx is not None:
        return new, jnp.sqrt(perf.kkt_error), a_p, perf, filt
    return new, jnp.sqrt(perf.kkt_error), a_p, perf


def _kkt_error(model, cost, limits, dt, barrier, t0, sol, q_init, v_init):
    _, _, perf, _ = _build_kkt(model, cost, limits, dt, barrier, t0, sol,
                               q_init, v_init)
    return jnp.sqrt(perf.kkt_error)


def _solve(model, cost, limits, dt, N, max_iter, kkt_tol, barrier, ftb,
           t0, enable_ls, ls_reduction, ls_min_step, sol, q_init, v_init):
    """Full Newton loop as one XLA computation (lax.while_loop). One
    _build_kkt per iteration: the convergence-check build is reused for the
    next Newton direction (same single-build structure as the contact
    solver). Non-finite KKT aborts with the last good iterate. With
    enable_ls, a Fletcher-Leyffer filter (carried through the loop state)
    backtracks the primal step (reference unconstr_line_search.cpp)."""
    from ..line_search.line_search import empty_filter

    def do_build(s):
        return _build_kkt(model, cost, limits, dt, barrier, t0, s,
                          q_init, v_init)

    def cond2(state):
        sol, built, it, kkt, _, ok, _ = state
        return (it < max_iter) & (kkt > kkt_tol) & ok

    def body2(state):
        sol, built, it, kkt, _, ok, filt = state
        if enable_ls:
            ls_ctx = (cost, dt, t0, q_init, v_init, filt, it,
                      ls_reduction, ls_min_step)
            new, _, alpha, _, filt = _direction_step(
                model, limits, barrier, ftb, built, sol, ls_ctx)
        else:
            new, _, alpha, _ = _direction_step(model, limits, barrier,
                                               ftb, built, sol)
        built_new = do_build(new)
        kkt_new = jnp.sqrt(built_new[2].kkt_error)
        ok_new = jnp.isfinite(kkt_new)
        new = jax.tree.map(lambda a, b: jnp.where(ok_new, a, b), new, sol)
        return (new, built_new, it + 1, jnp.where(ok_new, kkt_new, kkt),
                alpha, ok_new, filt)

    built0 = do_build(sol)
    kkt0 = jnp.sqrt(built0[2].kkt_error)
    one = jnp.asarray(1.0, sol.q.dtype)
    filt0 = empty_filter(sol.q.dtype)
    sol, _, iters, kkt, alpha, ok, _ = jax.lax.while_loop(
        cond2, body2, (sol, built0, jnp.asarray(0), kkt0, one,
                       jnp.isfinite(kkt0), filt0))
    stats = dict(iterations=iters, kkt_error=kkt, last_step_size=alpha,
                 convergence=(kkt <= kkt_tol) & ok)
    return sol, stats
