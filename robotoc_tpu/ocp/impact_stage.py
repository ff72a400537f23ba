"""Impact stage: impulse dynamics + impact-velocity constraint, condensed.

Reference: src/ocp/impact_stage.cpp + src/dynamics/impact_dynamics.cpp:8-97 +
impact_state_equation.cpp. At an impact slot (zero time duration):

  primal: (q, v) pre-impact, dv impulse velocity change, Lambda impulse
  forces (stored in the a / f slots of the solution);
  impulse dynamics:  RNEAImpact(q, dv) - J_i^T Lambda = 0      (dual beta)
  impact velocity:   v_imp(q, v + dv) = 0 on impacting contacts (dual mu)
  state equation:    q' = q (Lie residual),  v' = v + dv
  impact cost:       quadratize_impact of the cost container
  impact friction cone on Lambda (PDIPM, shares the cone slack storage).

A slot whose impact mask is all-zero degenerates to an identity pass-through
grid (dv, Lambda driven to zero; A = I) — this is how a STATIC number of
reserved event slots absorbs a varying number of events without shape
changes (replacing the reference's dynamic grid insertion,
time_discretization.cpp:44).

The LQR sees B = 0, Quu = I (dummy control), so the backward sweep stays
uniform across slot types on the TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constraints import friction_cone as fc
from ..constraints import pdipm
from ..costs import base as cost_base
from ..dynamics import state_equation as se
from ..dynamics.contact_dynamics import mjtj_inverse, ty_solve
from ..models import contacts as ct
from ..models import robot as rm
from .contact_stage import StageBlocks


def stage_pre(model, contacts, costs, limits, t, dt, barrier,
              q, v, dv, u, lam, beta, mu, lmd, gmm, lmd_n, gmm_n,
              q_n, v_n, s_lim, z_lim, s_cone, z_cone,
              imp_mask, p_ref, fric):
    """Impact pre-stage: fused impulse chain + impact cost + PDIPM
    vectors + state equation, emitted as the SAME condense-kernel input
    dict as the intermediate stage (ops/pallas_condense) — the stage type
    only changes the T_w columns, the A-row scale (sA = 1, not dt) and
    which cost blocks are zero. Hu_d = 1 makes the condensed Quu the
    identity dummy-control block."""
    nv, nu_dim = model.nv, model.dimu
    nf = contacts.max_dimf
    dtype = q.dtype
    rowmask = contacts.force_mask(imp_mask)
    cone_mask = contacts.cone_mask(imp_mask).astype(bool)

    # ---- impulse dynamics + impact velocity + cone: fused chain --------
    lam_eff = lam * rowmask
    vpost = v + dv
    fold = cost_base.kin_fold_frames(costs) == contacts.frame_ids
    out = ct.fused_impact_derivatives(
        model, contacts, q, dv, v, lam_eff, fric, with_task=fold)
    ((ID_res, C_raw, g_cone, dgdf), (dIDdq, M),
     (dCdq, J), dgdq) = out[:4]
    kin = (contacts.frame_ids,) + out[4] if fold else None
    C_res = C_raw * rowmask
    dCdq = dCdq * rowmask[:, None]
    J = J * rowmask[:, None]          # d/d(dv) = d/dv

    # ---- impact cost (only on slots carrying a REAL impact: unused
    # reserved slots must be pure identity pass-throughs) ----------------
    has_imp = jnp.max(imp_mask)
    quad = cost_base.quadratize_impact(costs, model, q, v, dv, t, kin=kin)
    c, lq_c, lv_c, ldv_c = (has_imp * quad.cost, has_imp * quad.lq,
                            has_imp * quad.lv, has_imp * quad.ldv)
    Wq, Wv, Wdv = (has_imp * quad.Qqq, has_imp * quad.Qvv,
                   has_imp * quad.Qdvdv)
    lf_c = jnp.zeros(nf, dtype)
    Wf = jnp.zeros((nf, nf), dtype)

    # ---- impact friction cone on Lambda (values from the fused chain) --
    d_cone = pdipm.condensing_diag(s_cone, z_cone, cone_mask)
    r_cone = pdipm.condensing_rhs(g_cone, s_cone, z_cone, barrier, cone_mask)
    zr = jnp.where(cone_mask, z_cone, 0.0) + r_cone
    cone_gq = dgdq.T @ zr
    cone_gf = dgdf.T @ zr

    # ---- state equation (dt = 0): q' = q, v' = v + dv ------------------
    Aqq, _, xres_q = se.linearize(model, q, jnp.zeros_like(v),
                                  jnp.zeros((), dtype), q_n)
    Fv_res = vpost - v_n

    # ---- condense-kernel inputs ----------------------------------------
    # rows: impulse: M ddv - J^T dlam = -(dIDdq dq + ID_res)
    #       vel:     J ddv = -(dCdq dq + J dv_dir + C_res)   (d/dv = J)
    Tw1 = jnp.concatenate([dIDdq, jnp.zeros((nv, nv), dtype),
                           jnp.zeros((nv, nu_dim), dtype)], axis=1)
    Tw2 = jnp.concatenate([dCdq, J, jnp.zeros((nf, nu_dim), dtype)], axis=1)
    e2 = jnp.where(rowmask > 0, C_res, lam)
    gw = jnp.concatenate([lq_c + cone_gq, lv_c,
                          jnp.zeros(nu_dim, dtype)])
    gy = jnp.concatenate([ldv_c, lf_c + cone_gf])

    # ---- full KKT residuals --------------------------------------------
    lq_full = (lq_c + dgdq.T @ jnp.where(cone_mask, z_cone, 0.0)
               + dIDdq.T @ beta + dCdq.T @ mu + Aqq.T @ lmd_n - lmd)
    lv_full = lv_c + J.T @ mu + gmm_n - gmm
    ldv_full = ldv_c + M.T @ beta + J.T @ mu + gmm_n
    lf_full = (lf_c + dgdf.T @ jnp.where(cone_mask, z_cone, 0.0)
               - J @ beta) * rowmask
    r_cone_p = pdipm.residual(g_cone, s_cone, cone_mask)
    c_cone = pdipm.complementarity(s_cone, z_cone, barrier, cone_mask)
    kkt_rest = (jnp.sum(xres_q**2) + jnp.sum(Fv_res**2)
                + jnp.sum(ID_res**2) + jnp.sum(C_res**2)
                + jnp.sum(lf_full**2)
                + jnp.sum(r_cone_p**2) + jnp.sum(c_cone**2))
    kkt_sq = (kkt_rest + jnp.sum(lq_full**2) + jnp.sum(lv_full**2)
              + jnp.sum(ldv_full**2))
    barrier_cost = pdipm.log_barrier(s_cone, barrier, cone_mask)
    prim = (jnp.sum(jnp.abs(xres_q)) + jnp.sum(jnp.abs(Fv_res))
            + jnp.sum(jnp.abs(ID_res)) + jnp.sum(jnp.abs(C_res))
            + jnp.sum(jnp.abs(r_cone_p)))
    dual = jnp.sum(jnp.abs(c_cone))

    return dict(
        M=M, J=J,
        inactive=1.0 - (1.0 - contacts.inv_damping) * rowmask,
        Tw1=Tw1, Tw2=Tw2,
        r1=ID_res, e2=e2,
        Wq=Wq, Wv=Wv, Wu=jnp.zeros((nu_dim, nu_dim), dtype),
        Wa=Wdv, Wf=Wf,
        Hq_d=jnp.zeros(nv, dtype), Hv_d=jnp.zeros(nv, dtype),
        Hu_d=jnp.ones(nu_dim, dtype),   # condensed Quu = I (dummy control)
        Ha_d=jnp.zeros(nv, dtype),
        dgdq=dgdq, dgdf=dgdf, d_cone=d_cone, gw=gw, gy=gy,
        Aqq=Aqq, Aqv=jnp.zeros((nv, nv), dtype),
        xres_q=xres_q, Fv_res=Fv_res,
        sA=jnp.ones((), dtype),
        lam2=jnp.concatenate([lmd_n, gmm_n]),
        lmdgmm=jnp.concatenate([lmd, gmm]),
        aux_e_lim=jnp.zeros_like(s_lim),   # joint limits off at impacts
        aux_e_cone=g_cone,
        aux_lq_full=lq_full, aux_lv_full=lv_full, aux_la_full=ldv_full,
        aux_kkt_sq=kkt_sq, aux_kkt_rest=kkt_rest, aux_cost=c,
        aux_barrier_cost=barrier_cost,
        aux_prim=prim, aux_dual=dual)


def stage_eval(model, contacts, costs, limits, t, dt, barrier,
               q, v, dv, u, lam, beta, mu, lmd, gmm, lmd_n, gmm_n,
               q_n, v_n, s_lim, z_lim, s_cone, z_cone,
               imp_mask, p_ref, fric):
    """Impact variant of a superstage (single-sample wrapper: pre ->
    shared JAX condense -> finish). dv/lam live in the a/f storage.
    imp_mask: (nc,) contacts becoming active at this impact."""
    from .contact_stage import condense_jax, stage_finish
    nv, nu_dim = model.nv, model.dimu
    nf = contacts.max_dimf
    pre = stage_pre(model, contacts, costs, limits, t, dt, barrier,
                    q, v, dv, u, lam, beta, mu, lmd, gmm, lmd_n, gmm_n,
                    q_n, v_n, s_lim, z_lim, s_cone, z_cone,
                    imp_mask, p_ref, fric)
    ko = condense_jax(nv, nu_dim, nf, pre)
    return stage_finish(nv, nu_dim, nf, pre, ko)


def expand(model, contacts, barrier, blocks: StageBlocks,
           dq, dv_dir, gmm_n_new,
           lam, beta, mu, s_cone, z_cone, imp_mask, fric, q):
    """Recover (ddv, dLambda, dbeta, dmu, cone slack/dual dirs)."""
    nv = model.nv
    rowmask = contacts.force_mask(imp_mask)
    cone_mask = contacts.cone_mask(imp_mask).astype(bool)
    nu_dim = model.dimu
    w = jnp.concatenate([dq, dv_dir, jnp.zeros(nu_dim, dq.dtype)])
    y = blocks.G @ w + blocks.c0
    ddv, dlam = y[:nv], y[nv:]
    gy_new = blocks.Hy @ y + blocks.Cwy.T @ w + blocks.gy
    ga = gy_new[:nv] + gmm_n_new          # dv-row carries gmm' (dt-free)
    gf = gy_new[nv:]
    rhs2 = jnp.where(rowmask > 0, gf, 0.0)
    beta_new, mu_new = ty_solve(blocks.inv11, blocks.inv12, blocks.Sinv,
                                -ga, rhs2)
    dbeta = beta_new - beta
    dmu = mu_new - mu
    de_cone = blocks.dgdq @ dq + blocks.dgdf @ (dlam * rowmask)
    ds_cone, dz_cone = pdipm.expand_slack_dual(
        blocks.e_cone, s_cone, z_cone, barrier, de_cone, cone_mask)
    return ddv, dlam, dbeta, dmu, ds_cone, dz_cone
