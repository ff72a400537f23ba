"""Intermediate stage of the contact OCP: evaluate + condense one grid.

TPU-native re-derivation of the reference's per-grid pipeline
(reference: src/ocp/intermediate_stage.cpp:85-149 — kinematics, cost
quadratization, constraint linearization/condensing, state equation,
contact-dynamics condensing, Lie correction), evaluated for ALL grids as one
vmapped kernel instead of an OpenMP loop.

Stage NLP (grid i, step dt):
  primal  s = (q, v, a, u, f),  duals: lmd/gmm (costates), beta (inverse
  dynamics), mu (contact constraint), PDIPM pairs for joint limits and
  friction cones.
  dynamics:    RNEA(q, v, a, f) = S_act^T u          (dual beta)
  contact:     Baumgarte C(q, v, a) = 0  on active contacts   (dual mu)
  state eq:    q' = q ⊕ dt v (Lie-corrected),  v' = v + dt a
  inequality:  joint box limits; friction cones (PDIPM, masked stacks)

Condensing eliminates (da, df, beta, mu) through the symmetric contact-space
KKT inverse (dynamics/contact_dynamics.py), yielding an LQR block over
x = (dq, dv), ubar = du. See that module's docstring for the algebra.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..constraints import friction_cone as fc
from ..constraints import joint_limits as jl
from ..constraints import pdipm
from ..costs import base as cost_base
from ..dynamics import state_equation as se
from ..dynamics.contact_dynamics import mjtj_inverse, ty_solve
from ..models import contacts as ct
from ..models import robot as rm


class StageBlocks(NamedTuple):
    # LQR blocks
    A: jnp.ndarray
    B: jnp.ndarray
    xres: jnp.ndarray
    Qxx: jnp.ndarray
    Qxu: jnp.ndarray
    Quu: jnp.ndarray
    lx: jnp.ndarray
    lu: jnp.ndarray
    # expansion data
    G: jnp.ndarray        # (nv+nf, 2nv+nu)  y = G w + c0
    c0: jnp.ndarray       # (nv+nf,)
    inv11: jnp.ndarray
    inv12: jnp.ndarray
    Sinv: jnp.ndarray
    Hy: jnp.ndarray       # (nv+nf, nv+nf) y-space Hessian
    Cwy: jnp.ndarray      # (2nv+nu, nv+nf) cross Hessian
    gy: jnp.ndarray       # (nv+nf,)
    e_lim: jnp.ndarray
    e_cone: jnp.ndarray
    dgdq: jnp.ndarray     # cone Jacobians (cached for the expansion)
    dgdf: jnp.ndarray
    # full-space stationarity rows (switching-constraint xi corrections
    # are applied on top of these at the _build level)
    lq_full: jnp.ndarray
    lv_full: jnp.ndarray
    la_full: jnp.ndarray
    # diagnostics
    kkt_sq: jnp.ndarray
    kkt_rest: jnp.ndarray  # kkt_sq minus the (lq, lv, la) squares
    cost: jnp.ndarray
    barrier_cost: jnp.ndarray
    prim_feas: jnp.ndarray
    dual_feas: jnp.ndarray


def stage_pre(model, contacts, costs, limits, t, dt, barrier,
              q, v, a, u, f, beta, mu, lmd, gmm, lmd_n, gmm_n,
              q_n, v_n, s_lim, z_lim, s_cone, z_cone,
              cmask, p_ref, fric, R_ref=None, chain_out=None):
    """Everything BEFORE the dense condensing: fused kinematic chain
    derivatives, cost quadratization, PDIPM condensing vectors, state
    equation, full-KKT diagnostics. Returns the condense-kernel input
    dict (ops/pallas_condense._IN_SPECS) plus aux fields ("aux_*").
    chain_out: precomputed chain kernel outputs (ops/pallas_chain) for
    this grid — the batched Pallas path computes them once for ALL
    stages at the _build level."""
    nv, nu_dim = model.nv, model.dimu
    nf = contacts.max_dimf
    dtype = q.dtype
    rowmask = contacts.force_mask(cmask)            # (nf,)
    cone_mask = contacts.cone_mask(cmask).astype(bool)

    # ---- dynamics + contacts + cone: ONE fused kinematic chain ---------
    # (inverse dynamics residual, Baumgarte residual, friction-cone values
    # and all Jacobians from a single forward sweep + one 3nv-tangent
    # jacfwd; models/contacts.py fused_stage_derivatives — or the Pallas
    # structured-tangent kernel via chain_out). Task-cost kinematics
    # (feet + CoM rows) ride the SAME chain when the cost stack opts in
    # (kin_frame_ids == the contact frames).
    f_eff = f * rowmask
    Sact = jnp.zeros((nu_dim, nv), dtype).at[:, nv - nu_dim:].set(
        jnp.eye(nu_dim, dtype=dtype))               # maps full->actuated
    fold = cost_base.kin_fold_frames(costs) == contacts.frame_ids
    if chain_out is not None:
        co = chain_out
        tau, C_raw, g_cone, dgdf = co["tau"], co["C"], co["g"], co["dgdf"]
        dIDdq, dIDdv, M = co["dtau_dq"], co["dtau_dv"], co["M"]
        dCdq, dCdv, J = co["dCdq"], co["dCdv"], co["J"]
        dgdq = co["dgdq"]
        kin = ((contacts.frame_ids, co["task"], co["dtask"])
               if fold else None)
    else:
        out = ct.fused_stage_derivatives(
            model, contacts, q, v, a, f_eff, fric, p_ref, R_ref,
            with_task=fold)
        ((tau, C_raw, g_cone, dgdf), (dIDdq, dIDdv, M),
         (dCdq, dCdv, J), dgdq) = out[:4]
        kin = (contacts.frame_ids,) + out[4] if fold else None
    ID_res = tau - Sact.T @ u
    if model.generalized_momentum_bias is not None:
        # runtime RobotProperties bias (reference robot.hxx:540-542);
        # constant, so the fused derivative chains are unaffected
        ID_res = ID_res - model.generalized_momentum_bias
    C_res = C_raw * rowmask
    dCdq = dCdq * rowmask[:, None]
    dCdv = dCdv * rowmask[:, None]
    J = J * rowmask[:, None]

    # ---- cost ----------------------------------------------------------
    if chain_out is not None and "cq_lq" in chain_out:
        # in-kernel cost quadratization (ops/pallas_chain with_cost):
        # the chain kernel emitted the combined gait-stack Gauss-Newton
        # blocks; only the diagonal v/a/u Hessians are assembled here
        co = chain_out
        cfg = costs[0]
        c = co["cq_cost"][0]
        lq_c, lv_c, la_c, lu_c = (co["cq_lq"], co["cq_lv"], co["cq_la"],
                                  co["cq_lu"])
        lf_c = jnp.zeros(nf, dtype)
        Wq = co["cq_Wq"]
        Wv = jnp.diag(dt * cfg.v_weight)
        Wa = jnp.diag(dt * cfg.a_weight)
        Wu = jnp.diag(dt * cfg.u_weight)
        Wf = jnp.zeros((nf, nf), dtype)
    else:
        quad = cost_base.quadratize_stage(costs, model, nf, q, v, a, u,
                                          f, t, dt, kin=kin)
        c, lq_c, lv_c, la_c, lu_c, lf_c = (quad.cost, quad.lq, quad.lv,
                                           quad.la, quad.lu, quad.lf)
        Wq, Wv, Wa, Wu, Wf = (quad.Qqq, quad.Qvv, quad.Qaa, quad.Quu,
                              quad.Qff)

    # ---- inequality constraints (PDIPM) --------------------------------
    e_lim = jl.constraint_values(model, limits, q, v, u, a)
    Hq_d, Hv_d, Hu_d, Ha_d, gq_cd, gv_cd, gu_cd, ga_cd = jl.condense(
        model, limits, e_lim, s_lim, z_lim, barrier)
    zq, zv, zu, za = jl.dual_residual(model, limits, z_lim)
    d_cone = pdipm.condensing_diag(s_cone, z_cone, cone_mask)
    r_cone = pdipm.condensing_rhs(g_cone, s_cone, z_cone, barrier, cone_mask)
    zr = jnp.where(cone_mask, z_cone, 0.0) + r_cone
    cone_gq = dgdq.T @ zr
    cone_gf = dgdf.T @ zr

    # ---- state equation (Lie-corrected) --------------------------------
    if chain_out is not None and "se_xres" in chain_out:
        # in-kernel Lie-Jacobian blocks (ops/pallas_chain state-eq fold);
        # only the 6x6 base blocks differ from the Euclidean form
        eye_nv = jnp.eye(nv, dtype=dtype)
        Aqq = eye_nv.at[:6, :6].set(chain_out["se_Aqq6"])
        Aqv = (dt * eye_nv).at[:6, :6].set(dt * chain_out["se_J1binv"])
        xres_q = chain_out["se_xres"]
    else:
        Aqq, Aqv, xres_q = se.linearize(model, q, v, dt, q_n)
    Fv_res = v + dt * a - v_n

    # ---- condense-kernel inputs ----------------------------------------
    Tw1 = jnp.concatenate([dIDdq, dIDdv, -Sact.T], axis=1)  # (nv, w)
    Tw2 = jnp.concatenate([dCdq, dCdv, jnp.zeros((nf, nu_dim), dtype)],
                          axis=1)
    e2 = jnp.where(rowmask > 0, C_res, f)   # rhs2_0: active C_res, else f
    gw = jnp.concatenate([lq_c + zq + gq_cd + cone_gq,
                          lv_c + zv + gv_cd,
                          lu_c + zu + gu_cd])
    gy = jnp.concatenate([la_c + za + ga_cd, lf_c + cone_gf])

    # ---- full KKT residuals (diagnostics, current duals) ---------------
    lq_full = (lq_c + zq + dgdq.T @ jnp.where(cone_mask, z_cone, 0.0)
               + dIDdq.T @ beta + dCdq.T @ mu
               + Aqq.T @ lmd_n - lmd)
    lv_full = (lv_c + zv + dIDdv.T @ beta + dCdv.T @ mu
               + Aqv.T @ lmd_n + gmm_n - gmm)
    la_full = la_c + za + M.T @ beta + J.T @ mu + dt * gmm_n
    lf_full = (lf_c + dgdf.T @ jnp.where(cone_mask, z_cone, 0.0)
               - J @ beta) * rowmask
    lu_full = lu_c + zu - Sact @ beta
    r_lim = pdipm.residual(e_lim, s_lim, limits.mask)
    c_lim = pdipm.complementarity(s_lim, z_lim, barrier, limits.mask)
    r_cone_p = pdipm.residual(g_cone, s_cone, cone_mask)
    c_cone = pdipm.complementarity(s_cone, z_cone, barrier, cone_mask)
    # kkt_rest excludes the (lq, lv, la) stationarity rows: the
    # switching-constraint branch (_build) REBUILDS the slot total as
    # kkt_rest + corrected squares — a pure sum of squares, so the
    # reported KKT can never be clamped/floored (round-3 review Weak #3)
    kkt_rest = (jnp.sum(xres_q**2) + jnp.sum(Fv_res**2)
                + jnp.sum(ID_res**2) + jnp.sum(C_res**2)
                + jnp.sum(lf_full**2) + jnp.sum(lu_full**2)
                + jnp.sum(r_lim**2) + jnp.sum(c_lim**2)
                + jnp.sum(r_cone_p**2) + jnp.sum(c_cone**2))
    kkt_sq = (kkt_rest + jnp.sum(lq_full**2) + jnp.sum(lv_full**2)
              + jnp.sum(la_full**2))
    barrier_cost = (pdipm.log_barrier(s_lim, barrier, limits.mask)
                    + pdipm.log_barrier(s_cone, barrier, cone_mask))
    prim = (jnp.sum(jnp.abs(xres_q)) + jnp.sum(jnp.abs(Fv_res))
            + jnp.sum(jnp.abs(ID_res)) + jnp.sum(jnp.abs(C_res))
            + jnp.sum(jnp.abs(r_lim)) + jnp.sum(jnp.abs(r_cone_p)))
    dual = jnp.sum(jnp.abs(c_lim)) + jnp.sum(jnp.abs(c_cone))

    return dict(
        # condense-kernel inputs (ops/pallas_condense._IN_SPECS order)
        # "inactive" is the -D diagonal of [[M, J^T], [J, -D]]: 1 on
        # inactive rows, contact_inv_damping on active rows (reference
        # robot.hxx:662-663 JMinvJt diagonal damping)
        M=M, J=J,
        inactive=1.0 - (1.0 - contacts.inv_damping) * rowmask,
        Tw1=Tw1, Tw2=Tw2,
        r1=ID_res, e2=e2,
        Wq=Wq, Wv=Wv, Wu=Wu, Wa=Wa, Wf=Wf,
        Hq_d=Hq_d, Hv_d=Hv_d, Hu_d=Hu_d, Ha_d=Ha_d,
        dgdq=dgdq, dgdf=dgdf, d_cone=d_cone, gw=gw, gy=gy,
        Aqq=Aqq, Aqv=Aqv, xres_q=xres_q, Fv_res=Fv_res,
        sA=dt, lam2=jnp.concatenate([lmd_n, gmm_n]),
        lmdgmm=jnp.concatenate([lmd, gmm]),
        # aux (pass-through to StageBlocks)
        aux_e_lim=e_lim, aux_e_cone=g_cone,
        aux_lq_full=lq_full, aux_lv_full=lv_full, aux_la_full=la_full,
        aux_kkt_sq=kkt_sq, aux_kkt_rest=kkt_rest, aux_cost=c,
        aux_barrier_cost=barrier_cost,
        aux_prim=prim, aux_dual=dual)


def condense_jax(nv, nu_dim, nf, pre):
    """Single-sample JAX condensing, identical math to the Pallas kernels
    (ops/pallas_condense) — the CPU/test path and the numerical oracle."""
    dtype = pre["M"].dtype
    inv11, inv12, Sinv = mjtj_inverse(pre["M"], pre["J"], pre["inactive"])
    X1, X2 = ty_solve(inv11, inv12, Sinv, pre["Tw1"], pre["Tw2"])
    x1_0, x2_0 = ty_solve(inv11, inv12, Sinv, pre["r1"], pre["e2"])
    # y = (da, df): da = -X1 w - x1_0 ; df = +(X2 w + x2_0)
    G = jnp.concatenate([-X1, X2], axis=0)            # (nv+nf, w)
    c0 = jnp.concatenate([-x1_0, x2_0], axis=0)

    dgdq, dgdf, d_cone = pre["dgdq"], pre["dgdf"], pre["d_cone"]
    cone_Hqq = dgdq.T @ (d_cone[:, None] * dgdq)
    cone_Hqf = dgdq.T @ (d_cone[:, None] * dgdf)
    cone_Hff = dgdf.T @ (d_cone[:, None] * dgdf)
    Hq_blk = pre["Wq"] + jnp.diag(pre["Hq_d"]) + cone_Hqq
    Hv_blk = pre["Wv"] + jnp.diag(pre["Hv_d"])
    Hu_blk = pre["Wu"] + jnp.diag(pre["Hu_d"])
    Ha_blk = pre["Wa"] + jnp.diag(pre["Ha_d"])
    Hf_blk = pre["Wf"] + cone_Hff

    w_dim = 2 * nv + nu_dim
    Hw = jnp.zeros((w_dim, w_dim), dtype)
    Hw = Hw.at[:nv, :nv].set(Hq_blk)
    Hw = Hw.at[nv:2 * nv, nv:2 * nv].set(Hv_blk)
    Hw = Hw.at[2 * nv:, 2 * nv:].set(Hu_blk)
    Ga, Gf = G[:nv], G[nv:]
    HyG = jnp.concatenate([Ha_blk @ Ga, Hf_blk @ Gf], axis=0)
    CwyG = jnp.zeros((w_dim, w_dim), dtype).at[:nv].set(cone_Hqf @ Gf)
    Htil = Hw + CwyG + CwyG.T + G.T @ HyG
    c0a, c0f = c0[:nv], c0[nv:]
    hy0 = jnp.concatenate([Ha_blk @ c0a, Hf_blk @ c0f]) + pre["gy"]
    Cc0 = jnp.zeros(w_dim, dtype).at[:nv].set(cone_Hqf @ c0f)
    gtil = pre["gw"] + Cc0 + G.T @ hy0

    sA = pre["sA"]
    A = jnp.zeros((2 * nv, 2 * nv), dtype)
    A = A.at[:nv, :nv].set(pre["Aqq"]).at[:nv, nv:].set(pre["Aqv"])
    A = A.at[nv:, :nv].set(sA * Ga[:, :nv])
    A = A.at[nv:, nv:].set(jnp.eye(nv, dtype=dtype)
                           + sA * Ga[:, nv:2 * nv])
    Bm = jnp.concatenate([jnp.zeros((nv, nu_dim), dtype),
                          sA * Ga[:, 2 * nv:]], axis=0)
    xres = jnp.concatenate([pre["xres_q"], pre["Fv_res"] + sA * c0a])
    lam = pre["lam2"]
    lx = gtil[:2 * nv] + A.T @ lam - pre["lmdgmm"]
    lu = gtil[2 * nv:] + Bm.T @ lam
    return dict(inv11=inv11, inv12=inv12, Sinv=Sinv, G=G, c0=c0,
                A=A, Bm=Bm, xres=xres,
                Qxx=Htil[:2 * nv, :2 * nv], Qxu=Htil[:2 * nv, 2 * nv:],
                Quu=Htil[2 * nv:, 2 * nv:], lx=lx, lu=lu,
                coneHqf=cone_Hqf, Hff_c=Hf_blk)


def stage_finish(nv, nu_dim, nf, pre, ko) -> StageBlocks:
    """Assemble StageBlocks from the pre-stage aux fields and the condense
    outputs (either backend). Single-sample; vmapped by the caller."""
    dtype = ko["A"].dtype
    w_dim = 2 * nv + nu_dim
    Hy = jnp.zeros((nv + nf, nv + nf), dtype)
    Hy = Hy.at[:nv, :nv].set(pre["Wa"] + jnp.diag(pre["Ha_d"]))
    Hy = Hy.at[nv:, nv:].set(ko["Hff_c"])
    Cwy = jnp.zeros((w_dim, nv + nf), dtype)
    Cwy = Cwy.at[:nv, nv:].set(ko["coneHqf"])
    return StageBlocks(
        A=ko["A"], B=ko["Bm"], xres=ko["xres"], Qxx=ko["Qxx"],
        Qxu=ko["Qxu"], Quu=ko["Quu"], lx=ko["lx"], lu=ko["lu"],
        G=ko["G"], c0=ko["c0"], inv11=ko["inv11"], inv12=ko["inv12"],
        Sinv=ko["Sinv"], Hy=Hy, Cwy=Cwy, gy=pre["gy"],
        e_lim=pre["aux_e_lim"], e_cone=pre["aux_e_cone"],
        dgdq=pre["dgdq"], dgdf=pre["dgdf"],
        lq_full=pre["aux_lq_full"], lv_full=pre["aux_lv_full"],
        la_full=pre["aux_la_full"],
        kkt_sq=pre["aux_kkt_sq"], kkt_rest=pre["aux_kkt_rest"],
        cost=pre["aux_cost"],
        barrier_cost=pre["aux_barrier_cost"],
        prim_feas=pre["aux_prim"], dual_feas=pre["aux_dual"])


def stage_eval(model, contacts, costs, limits, t, dt, barrier,
               q, v, a, u, f, beta, mu, lmd, gmm, lmd_n, gmm_n,
               q_n, v_n, s_lim, z_lim, s_cone, z_cone,
               cmask, p_ref, fric, R_ref=None):
    """One intermediate grid (single-sample compatibility wrapper:
    pre -> JAX condense -> finish). costs: tuple of cost components
    (costs/base.py); cmask: (nc,) activity; p_ref: (nc, 3);
    R_ref: (nc, 3, 3) surface-contact rotation refs (None = identity)."""
    nv, nu_dim = model.nv, model.dimu
    nf = contacts.max_dimf
    pre = stage_pre(model, contacts, costs, limits, t, dt, barrier,
                    q, v, a, u, f, beta, mu, lmd, gmm, lmd_n, gmm_n,
                    q_n, v_n, s_lim, z_lim, s_cone, z_cone,
                    cmask, p_ref, fric, R_ref)
    ko = condense_jax(nv, nu_dim, nf, pre)
    return stage_finish(nv, nu_dim, nf, pre, ko)


def expand(model, contacts, limits, barrier, blocks: StageBlocks,
           dq, dv, du, gmm_n_new, dt,
           f, beta, mu, s_lim, z_lim, s_cone, z_cone, cmask, fric, q):
    """Recover (da, df, dbeta, dmu, slack/dual dirs) from LQR directions
    (reference contact_dynamics.cpp:167-202 expandPrimal/expandDual).
    gmm_n_new: the UPDATED next-grid velocity costate gmm' + dgmm'."""
    nv, nu_dim = model.nv, model.dimu
    nf = contacts.max_dimf
    rowmask = contacts.force_mask(cmask)
    cone_mask = contacts.cone_mask(cmask).astype(bool)
    w = jnp.concatenate([dq, dv, du])
    y = blocks.G @ w + blocks.c0
    da, df = y[:nv], y[nv:]
    # dual expansion: T_y^T (beta, mu)_new = -(H_y y + C_wy^T w + g_y
    #                                          + S_y^T Lam'_new)
    gy_new = (blocks.Hy @ y + blocks.Cwy.T @ w + blocks.gy)
    ga = gy_new[:nv] + dt * gmm_n_new
    gf = gy_new[nv:]
    # rows: M beta + J^T mu = -ga ; J beta = gf (active), mu=0 (inactive)
    rhs2 = jnp.where(rowmask > 0, gf, 0.0)
    beta_new, mu_new = ty_solve(blocks.inv11, blocks.inv12, blocks.Sinv,
                                -ga, rhs2)
    dbeta = beta_new - beta
    dmu = mu_new - mu
    # slack/dual directions
    de_lim = jl.constraint_direction(model, limits, dq, dv, du, da)
    ds_lim, dz_lim = pdipm.expand_slack_dual(
        blocks.e_lim, s_lim, z_lim, barrier, de_lim, limits.mask)
    # cone Jacobians cached from the stage evaluation (one FK chain saved)
    de_cone = blocks.dgdq @ dq + blocks.dgdf @ (df * rowmask)
    ds_cone, dz_cone = pdipm.expand_slack_dual(
        blocks.e_cone, s_cone, z_cone, barrier, de_cone, cone_mask)
    return (da, df, dbeta, dmu, ds_lim, dz_lim, ds_cone, dz_cone,
            cone_mask)
