"""UnconstrParNMPCSolver: time-parallel backward-correction Newton method.

TPU-native counterpart of the reference's ParNMPC pipeline
(reference: src/parnmpc/unconstr_backward_correction.cpp:57-290,
unconstr_split_backward_correction.cpp, unconstr_kkt_matrix_inverter.hxx;
algorithm of Deng & Ohtsuka). Structure:

  1. COARSE: every stage i independently inverts its local 5nv x 5nv KKT
     block (with the next stage's auxiliary matrix approximating the tail
     problem) — embarrassingly parallel; here ONE batched inverse on the MXU
     instead of an OpenMP loop (reference :154-188).
  2. Backward + forward CORRECTION sweeps restore the neighbor coupling —
     cheap (2nv) mat-vecs, here lax.scans (reference :191-239).
  3. Primal/dual expansion (u, beta, PDIPM pairs), fraction-to-boundary,
     update — batched.

Stage i owns grid i+1's variables z_i = (lmd, gmm, a, q, v) plus condensed
(u, beta) and PDIPM pairs; x_prev of stage 0 is the measured state. Backward
Euler coupling:  Fq_i = q_{i-1} + dt v_i - q_i,  Fv_i = v_{i-1} + dt a_i - v_i.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.linalg import spd_inverse

from ..constraints import joint_limits as jl
from ..constraints import pdipm
from ..costs import base as cost_base
from ..costs import config_cost as cc
from ..models import robot as rm


@struct.dataclass
class ParNMPCSolution:
    q: jnp.ndarray        # (N, nq)    stage-owned grids 1..N
    v: jnp.ndarray
    a: jnp.ndarray
    u: jnp.ndarray
    lmd: jnp.ndarray
    gmm: jnp.ndarray
    beta: jnp.ndarray
    slack: jnp.ndarray    # (N, dimc)
    dual: jnp.ndarray
    aux: jnp.ndarray      # (N, 2nv, 2nv) auxiliary matrices


@struct.dataclass
class SolverOptions:
    max_iter: int = struct.field(pytree_node=False, default=100)
    kkt_tol: float = struct.field(pytree_node=False, default=1e-7)
    barrier: float = struct.field(pytree_node=False, default=1e-3)
    fraction_to_boundary_rule: float = struct.field(
        pytree_node=False, default=0.995)
    enable_line_search: bool = struct.field(pytree_node=False,
                                            default=False)
    """Fletcher-Leyffer filter line search on the primal step (reference
    unconstr_line_search.hpp:29, also used by UnconstrParNMPCSolver;
    default off like the reference)."""
    ls_reduction: float = struct.field(pytree_node=False, default=0.75)
    ls_min_step: float = struct.field(pytree_node=False, default=0.05)


class UnconstrParNMPCSolver:
    def __init__(self, model: rm.RobotModel, cost, limits, T: float, N: int,
                 options: SolverOptions = SolverOptions(), t0: float = 0.0):
        assert not model.floating_base
        self.model = model
        # generic cost container (tuple of components, costs/base.py)
        self.cost = tuple(cost) if isinstance(cost, (tuple, list)) \
            else (cost,)
        self.t0 = float(t0)
        self.limits = limits if limits is not None else \
            jl.make_joint_limits(model)
        self.T, self.N = float(T), int(N)
        self.dt = self.T / self.N
        self.options = options
        self._update = jax.jit(functools.partial(
            _update, model, self.cost, self.limits, self.dt,
            options.barrier, options.fraction_to_boundary_rule, self.t0,
            options.enable_line_search, options.ls_reduction,
            options.ls_min_step))
        self._kkt_error = jax.jit(functools.partial(
            _kkt_error, model, self.cost, self.limits, self.dt,
            options.barrier, self.t0))

    def init_solution(self, q, v) -> ParNMPCSolution:
        m = self.model
        N = self.N
        dtype = m.dtype
        q = jnp.broadcast_to(jnp.asarray(q, dtype), (N, m.nq))
        v = jnp.broadcast_to(jnp.asarray(v, dtype), (N, m.nv))
        z = jnp.zeros((N, m.nv), dtype)
        e = jl.constraint_values(m, self.limits, q, v, z, z)
        s0, z0 = pdipm.init_slack_dual(e, self.options.barrier,
                                       self.limits.mask)
        # terminal cost Hessian as initial aux matrices (reference :57-71)
        tq = cost_base.quadratize_terminal(self.cost, m, q[-1], v[-1],
                                           jnp.asarray(self.t0 + self.T,
                                                       dtype))
        Wq, Wv = tq.Qqq, tq.Qvv
        zb = jnp.zeros_like(Wq)
        aux0 = jnp.block([[Wq, zb], [zb, Wv]])
        aux = jnp.broadcast_to(aux0, (N, 2 * m.nv, 2 * m.nv))
        return ParNMPCSolution(q=q, v=v, a=z, u=z, lmd=z, gmm=z, beta=z,
                               slack=s0, dual=z0, aux=aux)

    def solve(self, q_init, v_init, sol=None, max_iter=None, tol=None):
        if sol is None:
            sol = self.init_solution(q_init, v_init)
        q_init = jnp.asarray(q_init, self.model.dtype)
        v_init = jnp.asarray(v_init, self.model.dtype)
        max_iter = max_iter or self.options.max_iter
        tol = tol or self.options.kkt_tol
        kkt = float(self._kkt_error(sol, q_init, v_init))
        it = 0
        failed = False
        from ..line_search.line_search import empty_filter
        filt = empty_filter(self.model.dtype)
        while it < max_iter and kkt > tol:
            sol, kkt_arr, alpha, filt = self._update(sol, q_init, v_init,
                                                     filt, jnp.asarray(it))
            kkt = float(self._kkt_error(sol, q_init, v_init))
            it += 1
            if float(alpha) == 0.0 or not jnp.isfinite(kkt):
                failed = True
                break
        return sol, dict(iterations=it, kkt_error=kkt,
                         numerical_failure=failed)


# ---------------------------------------------------------------------------

def _stage_terms(model, cost, limits, dt, barrier, t0, sol, q_init, v_init):
    """Batched per-stage KKT pieces (reference ParNMPC stage evalKKT).
    `cost` is the generic component container (costs/base.py)."""
    N = sol.q.shape[0]
    nv = model.nv
    q_prev = jnp.concatenate([q_init[None], sol.q[:-1]], axis=0)
    v_prev = jnp.concatenate([v_init[None], sol.v[:-1]], axis=0)
    lmd_next = jnp.concatenate([sol.lmd[1:], jnp.zeros((1, nv),
                                                       sol.q.dtype)], axis=0)
    gmm_next = jnp.concatenate([sol.gmm[1:], jnp.zeros((1, nv),
                                                       sol.q.dtype)], axis=0)
    is_term = jnp.zeros(N, sol.q.dtype).at[-1].set(1.0)
    ts = t0 + dt * jnp.arange(1, N + 1, dtype=sol.q.dtype)

    def one(t, qp, vp, q, v, a, u, beta, lmd, gmm, lmd_n, gmm_n, s, z,
            term):
        ID = rm.rnea(model, q, v, a)
        e_id = ID - u
        dIDdq, dIDdv, M = rm.rnea_derivatives(model, q, v, a)
        quad = cost_base.quadratize_stage(cost, model, 0, q, v, a, u,
                                          jnp.zeros((0,), q.dtype), t, dt)
        c, lq_c, lv_c, la_c, lu_c = (quad.cost, quad.lq, quad.lv, quad.la,
                                     quad.lu)
        Wq, Wv, Wa, Wu = quad.Qqq, quad.Qvv, quad.Qaa, quad.Quu
        tq = cost_base.quadratize_terminal(cost, model, q, v, t)
        lq_c = lq_c + term * tq.lq
        lv_c = lv_c + term * tq.lv
        Wq = Wq + term * tq.Qqq
        Wv = Wv + term * tq.Qvv
        c = c + term * tq.cost
        e = jl.constraint_values(model, limits, q, v, u, a)
        Hq_d, Hv_d, Hu_d, Ha_d, gq_cd, gv_cd, gu_cd, ga_cd = jl.condense(
            model, limits, e, s, z, barrier)
        zq, zv, zu, za = jl.dual_residual(model, limits, z)
        Huu = jnp.diag(Wu) + Hu_d
        gu0 = lu_c + zu + gu_cd
        gID = gu0 + Huu * e_id
        # condensed gradients (ParNMPC coupling: backward Euler)
        la = la_c + za + ga_cd + M.T @ gID + dt * gmm
        lq = lq_c + zq + gq_cd + dIDdq.T @ gID - lmd + lmd_n
        lv = lv_c + zv + gv_cd + dIDdv.T @ gID + dt * lmd - gmm + gmm_n
        Fq = qp + dt * v - q
        Fv = vp + dt * a - v
        # condensed Hessian blocks
        HJ = Huu[:, None]
        Qaa = Wa + jnp.diag(Ha_d) + M.T @ (HJ * M)
        Qaq = M.T @ (HJ * dIDdq)
        Qav = M.T @ (HJ * dIDdv)
        Qqq = Wq + jnp.diag(Hq_d) + dIDdq.T @ (HJ * dIDdq)
        Qqv = dIDdq.T @ (HJ * dIDdv)
        Qvv = Wv + jnp.diag(Hv_d) + dIDdv.T @ (HJ * dIDdv)
        # full KKT residual pieces (for the error norm)
        lu_full = lu_c + zu - beta
        la_full = la_c + za + M.T @ beta + dt * gmm
        lq_full = lq_c + zq + dIDdq.T @ beta - lmd + lmd_n
        lv_full = lv_c + zv + dIDdv.T @ beta + dt * lmd - gmm + gmm_n
        r_lim = pdipm.residual(e, s, limits.mask)
        c_lim = pdipm.complementarity(s, z, barrier, limits.mask)
        kkt_sq = (jnp.sum(Fq**2) + jnp.sum(Fv**2) + jnp.sum(e_id**2)
                  + jnp.sum(lq_full**2) + jnp.sum(lv_full**2)
                  + jnp.sum(la_full**2) + jnp.sum(lu_full**2)
                  + jnp.sum(r_lim**2) + jnp.sum(c_lim**2))
        aux_pieces = dict(e_id=e_id, dIDdq=dIDdq, dIDdv=dIDdv, M=M,
                          Huu=Huu, gu0=gu0, e=e)
        return (Fq, Fv, la, lq, lv, Qaa, Qaq, Qav, Qqq, Qqv, Qvv,
                kkt_sq, aux_pieces)

    return jax.vmap(one)(ts, q_prev, v_prev, sol.q, sol.v, sol.a, sol.u,
                         sol.beta, sol.lmd, sol.gmm, lmd_next, gmm_next,
                         sol.slack, sol.dual, is_term)


def _kkt_error(model, cost, limits, dt, barrier, t0, sol, q_init, v_init):
    out = _stage_terms(model, cost, limits, dt, barrier, t0, sol, q_init,
                       v_init)
    return jnp.sqrt(jnp.sum(out[11]))


def _eval_parnmpc(model, cost, limits, dt, barrier, t0, sol, q_init,
                  v_init):
    """(cost + log-barrier, l1 primal feasibility) of a ParNMPC iterate
    (backward-Euler gaps; line-search evaluation, reference
    unconstr_line_search.cpp:55-58)."""
    N = sol.q.shape[0]
    q_prev = jnp.concatenate([q_init[None], sol.q[:-1]], axis=0)
    v_prev = jnp.concatenate([v_init[None], sol.v[:-1]], axis=0)
    is_term = jnp.zeros(N, sol.q.dtype).at[-1].set(1.0)
    ts = t0 + dt * jnp.arange(1, N + 1, dtype=sol.q.dtype)

    def one(t, qp, vp, q, v, a, u, s, term):
        e_id = rm.rnea(model, q, v, a) - u
        Fq = qp + dt * v - q
        Fv = vp + dt * a - v
        c = cost_base.eval_stage(cost, model, q, v, a, u,
                                 jnp.zeros((0,), q.dtype), t, dt)
        c = c + term * cost_base.eval_terminal(cost, model, q, v, t)
        e = jl.constraint_values(model, limits, q, v, u, a)
        bar = pdipm.log_barrier(s, barrier, limits.mask)
        viol = (jnp.sum(jnp.abs(Fq)) + jnp.sum(jnp.abs(Fv))
                + jnp.sum(jnp.abs(e_id))
                + jnp.sum(jnp.abs(pdipm.residual(e, s, limits.mask))))
        return c + bar, viol

    cs, viols = jax.vmap(one)(ts, q_prev, v_prev, sol.q, sol.v, sol.a,
                              sol.u, sol.slack, is_term)
    return jnp.sum(cs), jnp.sum(viols)


def _update(model, cost, limits, dt, barrier, ftb, t0,
            enable_ls, ls_reduction, ls_min_step,
            sol: ParNMPCSolution, q_init, v_init, filt=None, it=0):
    N = sol.q.shape[0]
    nv = model.nv
    dtype = sol.q.dtype
    (Fq, Fv, la, lq, lv, Qaa, Qaq, Qav, Qqq, Qqv, Qvv, kkt_sq,
     aux_p) = _stage_terms(model, cost, limits, dt, barrier, t0, sol,
                           q_init, v_init)

    # aux of the NEXT stage added to Qxx (terminal stage: none)
    aux_next = jnp.concatenate(
        [sol.aux[1:], jnp.zeros((1, 2 * nv, 2 * nv), dtype)], axis=0)
    Qqq = Qqq + aux_next[:, :nv, :nv]
    Qqv = Qqv + aux_next[:, :nv, nv:]
    Qvv = Qvv + aux_next[:, nv:, nv:]

    # per-stage KKT inverse via the Schur complement on the PD Hessian
    # block (reference parnmpc/unconstr_kkt_matrix_inverter.hxx — two
    # Cholesky factorizations of sizes 3nv and 2nv instead of one dense
    # 5nv LU): for KKT = [[0, F], [F^T, H]],
    #   S = F H^{-1} F^T,
    #   inv = [[-S^{-1}, S^{-1} F H^{-1}],
    #          [(S^{-1} F H^{-1})^T, H^{-1} - H^{-1}F^T S^{-1} F H^{-1}]].
    def kkt_inverse(Qaa, Qaq, Qav, Qqq, Qqv, Qvv):
        eye = jnp.eye(nv, dtype=dtype)
        Z = jnp.zeros((nv, nv), dtype)
        F = jnp.block([[Z, -eye, dt * eye],
                       [dt * eye, Z, -eye]])           # (2nv, 3nv)
        H = jnp.block([[Qaa, Qaq, Qav],
                       [Qaq.T, Qqq, Qqv],
                       [Qav.T, Qqv.T, Qvv]])
        Hi = spd_inverse(H)
        FHi = F @ Hi                                   # (2nv, 3nv)
        S = FHi @ F.T
        Si = spd_inverse(S)
        TR = Si @ FHi                                  # (2nv, 3nv)
        BR = Hi - FHi.T @ TR
        top = jnp.concatenate([-Si, TR], axis=1)
        bot = jnp.concatenate([TR.T, BR], axis=1)
        return jnp.concatenate([top, bot], axis=0)

    KKT_inv = jax.vmap(kkt_inverse)(Qaa, Qaq, Qav, Qqq, Qqv, Qvv)
    res = jnp.concatenate([Fq, Fv, la, lq, lv], axis=1)    # (N, 5nv)
    dz = jnp.einsum("nij,nj->ni", KKT_inv, res)
    # coarse new iterate z_new = z - dz, z = (lmd, gmm, a, q, v)
    lmd_new = sol.lmd - dz[:, :nv]
    gmm_new = sol.gmm - dz[:, nv:2 * nv]
    a_new = sol.a - dz[:, 2 * nv:3 * nv]
    q_new = sol.q - dz[:, 3 * nv:4 * nv]
    v_new = sol.v - dz[:, 4 * nv:]

    # ---- backward correction (serial over stages, reference :191-199) --
    inv_TR = KKT_inv[:, :2 * nv, 3 * nv:]      # (N, 2nv, 2nv) lmdgmm<-x
    inv_BR = KKT_inv[:, 2 * nv:, 3 * nv:]      # (N, 3nv, 2nv)

    def bwd(carry, inp):
        lg_new_next, lg_next = carry
        (invTR_i, lmd_i, gmm_i, lmdg_new_i) = inp
        x_res = lg_new_next - lg_next
        corr = invTR_i @ x_res
        lmdg_corr = lmdg_new_i - corr
        return (lmdg_corr, jnp.concatenate([lmd_i, gmm_i])), (lmdg_corr,
                                                              x_res)

    lg_new = jnp.concatenate([lmd_new, gmm_new], axis=1)
    lg_cur = jnp.concatenate([sol.lmd, sol.gmm], axis=1)
    carry0 = (lg_new[-1], lg_cur[-1])
    (_, _), (lg_corr, x_res_b) = jax.lax.scan(
        bwd, carry0,
        (inv_TR[:-1], sol.lmd[:-1], sol.gmm[:-1], lg_new[:-1]),
        reverse=True)
    lg_new = jnp.concatenate([lg_corr, lg_new[-1:]], axis=0)
    x_res_b_full = jnp.concatenate(
        [x_res_b, jnp.zeros((1, 2 * nv), dtype)], axis=0)
    # parallel part: correct (a, q, v) with the same x_res
    corr_aqv = jnp.einsum("nij,nj->ni", inv_BR, x_res_b_full)
    a_new = a_new - corr_aqv[:, :nv]
    q_new = q_new - corr_aqv[:, nv:2 * nv]
    v_new = v_new - corr_aqv[:, 2 * nv:]

    # ---- forward correction (serial, reference :203-207) ---------------
    inv_BL = KKT_inv[:, 3 * nv:, :2 * nv]      # x <- lmdgmm block
    inv_TL3 = KKT_inv[:, :3 * nv, :2 * nv]

    def fwd(carry, inp):
        x_new_prev, x_prev = carry
        (invBL_i, q_i, v_i, qv_new_i) = inp
        x_res = x_new_prev - x_prev
        corr = invBL_i @ x_res
        qv_corr = qv_new_i - corr
        return (qv_corr, jnp.concatenate([q_i, v_i])), (qv_corr, x_res)

    qv_new = jnp.concatenate([q_new, v_new], axis=1)
    qv_cur = jnp.concatenate([sol.q, sol.v], axis=1)
    carry0 = (qv_new[0], qv_cur[0])
    (_, _), (qv_corr, x_res_f) = jax.lax.scan(
        fwd, carry0, (inv_BL[1:], sol.q[1:], sol.v[1:], qv_new[1:]))
    qv_new = jnp.concatenate([qv_new[:1], qv_corr], axis=0)
    x_res_f_full = jnp.concatenate(
        [jnp.zeros((1, 2 * nv), dtype), x_res_f], axis=0)
    corr_lga = jnp.einsum("nij,nj->ni", inv_TL3, x_res_f_full)
    lg_new = lg_new - corr_lga[:, :2 * nv]
    a_new = a_new - corr_lga[:, 2 * nv:]
    q_new, v_new = qv_new[:, :nv], qv_new[:, nv:]

    # new aux matrices (reference :210: aux_mat_[i] = -auxMat())
    aux_new = -KKT_inv[:, :2 * nv, :2 * nv]
    aux_new = jnp.concatenate([sol.aux[:1], aux_new[1:]], axis=0)

    # ---- directions + expansion ----------------------------------------
    dlmd = lg_new[:, :nv] - sol.lmd
    dgmm = lg_new[:, nv:] - sol.gmm
    da = a_new - sol.a
    dq = q_new - sol.q
    dv = v_new - sol.v
    du = (jnp.einsum("nij,nj->ni", aux_p["dIDdq"], dq)
          + jnp.einsum("nij,nj->ni", aux_p["dIDdv"], dv)
          + jnp.einsum("nij,nj->ni", aux_p["M"], da) + aux_p["e_id"])
    dbeta = aux_p["gu0"] + aux_p["Huu"] * du - sol.beta
    de = jl.constraint_direction(model, limits, dq, dv, du, da)
    ds, dz_ = pdipm.expand_slack_dual(aux_p["e"], sol.slack, sol.dual,
                                      barrier, de, limits.mask)
    a_p = pdipm.fraction_to_boundary(sol.slack, ds, ftb, limits.mask)
    a_d = pdipm.fraction_to_boundary(sol.dual, dz_, ftb, limits.mask)
    if enable_ls and filt is not None:
        from ..line_search import unconstr_line_search as uls
        from ..line_search.line_search import (filter_augment,
                                               filter_search)
        c_cur, v_cur = _eval_parnmpc(model, cost, limits, dt, barrier,
                                     t0, sol, q_init, v_init)
        empty = ~jnp.any(jnp.isfinite(filt[:, 1]))
        filt = jnp.where(empty, filter_augment(filt, it, c_cur, v_cur),
                         filt)

        def trial(alpha):
            return sol.replace(q=sol.q + alpha * dq,
                               v=sol.v + alpha * dv,
                               a=sol.a + alpha * da,
                               u=sol.u + alpha * du,
                               slack=sol.slack + alpha * ds)

        def eval_fn(s):
            return _eval_parnmpc(model, cost, limits, dt, barrier, t0,
                                 s, q_init, v_init)

        a_p, c_t, v_t = filter_search(trial, eval_fn, a_p,
                                      filt, reduction=ls_reduction,
                                      alpha_min=ls_min_step)
        filt = filter_augment(filt, it + 1, c_t, v_t)
    new = ParNMPCSolution(
        q=sol.q + a_p * dq, v=sol.v + a_p * dv, a=sol.a + a_p * da,
        u=sol.u + a_p * du, lmd=sol.lmd + a_p * dlmd,
        gmm=sol.gmm + a_p * dgmm, beta=sol.beta + a_p * dbeta,
        slack=sol.slack + a_p * ds, dual=sol.dual + a_d * dz_,
        aux=aux_new)
    # numerical-failure guard (mirrors the contact solver's dir_ok path):
    # a PSD-but-singular condensed Hessian makes cho_factor yield NaNs —
    # keep the previous iterate and report a zero step instead of
    # poisoning the solution.
    dir_ok = jnp.all(jnp.asarray(
        [jnp.all(jnp.isfinite(x)) for x in jax.tree.leaves(new)]))
    new = jax.tree.map(lambda a, b: jnp.where(dir_ok, a, b), new, sol)
    a_p = jnp.where(dir_ok, a_p, 0.0)
    return new, jnp.sqrt(kkt_sq.sum()), a_p, filt
