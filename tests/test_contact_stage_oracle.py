"""Randomized per-stage oracle tests for the contact-dynamics condensing.

Mirrors the reference's dominant unit-test pattern (reference
test/ocp/intermediate_stage_test.cpp:55-189: call the component, re-execute
its algebra inline, compare): assemble the FULL stage KKT pieces directly
from the public kernels (RNEA derivatives, Baumgarte derivatives, cost
quadratization) on random iterates and verify the condensed LQR blocks and
primal/dual expansion reproduce the dense Schur elimination exactly, across
active/inactive contact masks and on impact slots."""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robotoc_tpu.constraints import pdipm
from robotoc_tpu.constraints.joint_limits import make_joint_limits
from robotoc_tpu.costs.config_cost import make_config_cost
from robotoc_tpu.models import load_robot
from robotoc_tpu.models import contacts as ct
from robotoc_tpu.models import robot as rm
from robotoc_tpu.ocp import contact_stage as stage
from robotoc_tpu.ocp import impact_stage as istage

FEET = ["LF_FOOT", "LH_FOOT", "RF_FOOT", "RH_FOOT"]
Q0 = jnp.array([0, 0, 0.4792, 0, 0, 0, 1, -0.1, 0.7, -1.0,
                -0.1, -0.7, 1.0, 0.1, 0.7, -1.0, 0.1, -0.7, 1.0])


def _setup(seed, cmask_list):
    m = load_robot("anymal")
    contacts = ct.make_contacts(m, FEET, baumgarte_time_step=0.04)
    cost = make_config_cost(
        m, q_ref=Q0, q_weight=jnp.full(18, 2.0), v_weight=jnp.full(18, 1.0),
        a_weight=1e-3, u_weight=1e-2, q_weight_terminal=jnp.full(18, 2.0),
        v_weight_terminal=jnp.full(18, 1.0),
        q_weight_impact=jnp.full(18, 1.5),
        v_weight_impact=jnp.full(18, 1.0),
        dv_weight_impact=jnp.full(18, 1e-3))
    lim = make_joint_limits(m, u_limit=jnp.full(12, 80.0),
                            v_limit=jnp.full(12, 15.0))
    ks = jax.random.split(jax.random.PRNGKey(seed), 12)
    q = rm.integrate(m, Q0, 0.1 * jax.random.normal(ks[0], (18,)))
    q_n = rm.integrate(m, q, 0.05 * jax.random.normal(ks[1], (18,)))
    v = jax.random.normal(ks[2], (18,))
    v_n = jax.random.normal(ks[3], (18,))
    a = jax.random.normal(ks[4], (18,))
    u = jax.random.normal(ks[5], (12,))
    f = jax.random.normal(ks[6], (12,))
    beta = jax.random.normal(ks[7], (18,))
    mu = jax.random.normal(ks[8], (12,))
    lmd = jax.random.normal(ks[9], (18,))
    gmm = jax.random.normal(ks[10], (18,))
    lmd_n, gmm_n = jnp.split(jax.random.normal(ks[11], (36,)), 2)
    cmask = jnp.asarray(cmask_list, jnp.float64)
    barrier = 1e-3
    # strictly feasible PDIPM state
    e_lim = jnp.asarray(
        np.asarray(jax.vmap(lambda x: x)(jnp.zeros(1)))[0])  # placeholder
    from robotoc_tpu.constraints import joint_limits as jl
    e_lim = jl.constraint_values(m, lim, q, v, u, a)
    s_lim, z_lim = pdipm.init_slack_dual(e_lim[None], barrier,
                                         lim.mask)
    s_lim, z_lim = s_lim[0], z_lim[0]
    from robotoc_tpu.constraints import friction_cone as fc
    fric = jnp.full(4, 0.7)
    rowmask = contacts.force_mask(cmask)
    g_cone, _, _ = fc.residual_and_jac(m, contacts, q, f * rowmask, fric)
    cone_mask = contacts.cone_mask(cmask) > 0
    s_cone, z_cone = pdipm.init_slack_dual(g_cone[None], barrier, cone_mask)
    s_cone, z_cone = s_cone[0], z_cone[0]
    p_ref = jnp.asarray(np.random.RandomState(seed).randn(4, 3) * 0.1)
    R_ref = jnp.broadcast_to(jnp.eye(3), (4, 3, 3))
    return dict(m=m, contacts=contacts, cost=cost, lim=lim, q=q, v=v, a=a,
                u=u, f=f, beta=beta, mu=mu, lmd=lmd, gmm=gmm, lmd_n=lmd_n,
                gmm_n=gmm_n, q_n=q_n, v_n=v_n, s_lim=s_lim, z_lim=z_lim,
                s_cone=s_cone, z_cone=z_cone, cmask=cmask, p_ref=p_ref,
                R_ref=R_ref, fric=fric, barrier=barrier, dt=0.03)


@pytest.mark.parametrize("seed,cmask", [
    (0, [1, 1, 1, 1]),
    (1, [1, 0, 1, 0]),
    (2, [0, 0, 0, 0]),
])
def test_condensing_matches_dense_elimination(seed, cmask):
    """y = G w + c0 must solve the dense contact-dynamics KKT system row by
    row, and the condensed quadratic must equal the full quadratic
    evaluated at the eliminated y(w)."""
    s = _setup(seed, cmask)
    m, contacts = s["m"], s["contacts"]
    nv, nu, nf = m.nv, m.dimu, contacts.max_dimf
    blocks = stage.stage_eval(
        m, contacts, (s["cost"],), s["lim"], 0.1, s["dt"],
        jnp.asarray(s["barrier"]),
        s["q"], s["v"], s["a"], s["u"], s["f"], s["beta"], s["mu"],
        s["lmd"], s["gmm"], s["lmd_n"], s["gmm_n"], s["q_n"], s["v_n"],
        s["s_lim"], s["z_lim"], s["s_cone"], s["z_cone"],
        s["cmask"], s["p_ref"], s["fric"], s["R_ref"])

    # --- recompute the dense pieces from the public kernels -------------
    rowmask = np.asarray(contacts.force_mask(s["cmask"]))
    act = np.where(rowmask > 0)[0]
    ina = np.where(rowmask == 0)[0]
    f_eff = s["f"] * rowmask
    fj = ct.contact_forces_to_joint(m, contacts, f_eff)
    Sact = np.zeros((nu, nv))
    Sact[:, nv - nu:] = np.eye(nu)
    ID_res = np.asarray(rm.rnea(m, s["q"], s["v"], s["a"], fj)
                        - jnp.concatenate([jnp.zeros(6), s["u"]]))
    dIDdq, dIDdv, M = [np.asarray(x) for x in rm.rnea_derivatives(
        m, s["q"], s["v"], s["a"], fj)]
    C_res = np.asarray(ct.baumgarte_residual(
        m, contacts, s["q"], s["v"], s["a"], s["p_ref"],
        s["R_ref"])) * rowmask
    dCdq, dCdv, J = [np.asarray(x) * rowmask[:, None]
                     for x in ct.baumgarte_derivatives(
                         m, contacts, s["q"], s["v"], s["a"], s["p_ref"],
                         s["R_ref"])]

    rng = np.random.RandomState(100 + seed)
    w = rng.randn(2 * nv + nu)
    dq, dv, du = w[:nv], w[nv:2 * nv], w[2 * nv:]

    # dense elimination (dID/df = -J^T: forces enter RNEA negatively):
    #   [M  -J_a'][da ]   [-(ID_res + dIDdq dq + dIDdv dv - S' du)]
    #   [J_a   0 ][dfa] = [-(C_res + dCdq dq + dCdv dv)_a          ]
    # inactive rows: df_i = -f_i (drive the stored force to zero)
    Ja = np.asarray(J)[act]
    K = np.block([[M, -Ja.T], [Ja, np.zeros((len(act), len(act)))]])
    r1 = -(ID_res + dIDdq @ dq + dIDdv @ dv - Sact.T @ du)
    r2 = -(C_res + dCdq @ dq + dCdv @ dv)[act]
    sol_dense = np.linalg.solve(K, np.concatenate([r1, r2]))
    da_dense = sol_dense[:nv]
    df_dense = np.zeros(nf)
    # the KKT unknown in the dense system is df on active rows
    df_dense[act] = sol_dense[nv:]
    df_dense[ina] = -np.asarray(s["f"])[ina]

    y = np.asarray(blocks.G) @ w + np.asarray(blocks.c0)
    np.testing.assert_allclose(y[:nv], da_dense, atol=1e-9,
                               err_msg="da from condensing")
    np.testing.assert_allclose(y[nv:], df_dense, atol=1e-9,
                               err_msg="df from condensing")

    # Quadratic-consistency: Htil = Hw + Cwy G + G'Cwy' + G'Hy G. Verify
    # the identity with the returned expansion blocks.
    Hw_only = np.block(
        [[np.asarray(blocks.Qxx), np.asarray(blocks.Qxu)],
         [np.asarray(blocks.Qxu).T, np.asarray(blocks.Quu)]])
    G = np.asarray(blocks.G)
    Hy = np.asarray(blocks.Hy)
    Cwy = np.asarray(blocks.Cwy)
    recon = Cwy @ G + G.T @ Cwy.T + G.T @ Hy @ G
    # Hw (the w-only block) = Htil - recon must be symmetric PSD-ish with
    # zero (x,u) cross terms coming only from the cost/constraints:
    Hw = Hw_only - recon
    np.testing.assert_allclose(Hw, Hw.T, atol=1e-8)

    # --- dual expansion: (beta_new, mu_new) satisfy the y-stationarity --
    gmm_n_new = s["gmm_n"]
    out = stage.expand(
        m, contacts, s["lim"], s["barrier"], blocks,
        jnp.asarray(dq), jnp.asarray(dv), jnp.asarray(du), gmm_n_new,
        s["dt"], s["f"], s["beta"], s["mu"], s["s_lim"], s["z_lim"],
        s["s_cone"], s["z_cone"], s["cmask"], s["fric"], s["q"])
    da_o, df_o, dbeta, dmu = [np.asarray(x) for x in out[:4]]
    np.testing.assert_allclose(da_o, da_dense, atol=1e-9)
    np.testing.assert_allclose(df_o, df_dense, atol=1e-9)
    beta_new = np.asarray(s["beta"]) + dbeta
    mu_new = np.asarray(s["mu"]) + dmu
    # stationarity wrt (da, df): the y-space gradient of the condensed
    # quadratic plus the dynamics duals must vanish:
    #   Hy y + Cwy' w + gy + [dt*gmm_n'; 0] + Ty' (beta, mu) = 0
    gy_new = Hy @ y + Cwy.T @ w + np.asarray(blocks.gy)
    ga = gy_new[:nv] + np.asarray(s["dt"] * gmm_n_new)
    res_a = ga + M.T @ beta_new + np.asarray(J).T @ mu_new
    np.testing.assert_allclose(res_a, 0.0, atol=1e-9,
                               err_msg="a-row dual stationarity")
    # f-row (active): gf - J beta = 0
    gf = gy_new[nv:]
    res_f = (gf - np.asarray(J) @ beta_new)[act]
    np.testing.assert_allclose(res_f, 0.0, atol=1e-9,
                               err_msg="f-row dual stationarity")
    # inactive contact rows carry zero multiplier
    np.testing.assert_allclose(mu_new[ina], 0.0, atol=1e-9)


@pytest.mark.parametrize("imask", [[1, 1, 1, 1], [1, 0, 0, 1],
                                   [0, 0, 0, 0]])
def test_impact_condensing_matches_dense_elimination(imask):
    """Same oracle for the impact stage (impulse dynamics + impact
    velocity constraint), including the all-zero pass-through slot."""
    s = _setup(7, [1, 1, 1, 1])
    m, contacts = s["m"], s["contacts"]
    nv, nu, nf = m.nv, m.dimu, contacts.max_dimf
    imask_j = jnp.asarray(imask, jnp.float64)
    blocks = istage.stage_eval(
        m, contacts, (s["cost"],), s["lim"], 0.1, jnp.asarray(0.0),
        jnp.asarray(s["barrier"]),
        s["q"], s["v"], s["a"], s["u"], s["f"], s["beta"], s["mu"],
        s["lmd"], s["gmm"], s["lmd_n"], s["gmm_n"], s["q_n"], s["v_n"],
        s["s_lim"], s["z_lim"], s["s_cone"], s["z_cone"],
        imask_j, s["p_ref"], s["fric"])
    rowmask = np.asarray(contacts.force_mask(imask_j))
    act = np.where(rowmask > 0)[0]
    ina = np.where(rowmask == 0)[0]
    lam_eff = s["f"] * rowmask
    fj = ct.contact_forces_to_joint(m, contacts, lam_eff)
    ID_res = np.asarray(rm.rnea_impact(m, s["q"], s["a"], fj))
    dIDdq, Mi = [np.asarray(x) for x in rm.rnea_impact_derivatives(
        m, s["q"], s["a"], fj)]
    vpost = s["v"] + s["a"]
    C_res = np.asarray(ct.impact_velocity_residual(
        m, contacts, s["q"], vpost)) * rowmask
    dCdq, J = [np.asarray(x) * rowmask[:, None]
               for x in ct.impact_velocity_derivatives(m, contacts,
                                                       s["q"], vpost)]
    rng = np.random.RandomState(3)
    w = rng.randn(2 * nv + nu)
    dq, dv, du = w[:nv], w[nv:2 * nv], w[2 * nv:]
    Ja = J[act]
    K = np.block([[Mi, -Ja.T], [Ja, np.zeros((len(act), len(act)))]])
    r1 = -(ID_res + dIDdq @ dq)
    r2 = -(C_res + dCdq @ dq + J @ dv)[act]
    sol_dense = np.linalg.solve(K, np.concatenate([r1, r2]))
    ddv_dense = sol_dense[:nv]
    dlam_dense = np.zeros(nf)
    dlam_dense[act] = sol_dense[nv:]
    dlam_dense[ina] = -np.asarray(s["f"])[ina]
    y = np.asarray(blocks.G) @ w + np.asarray(blocks.c0)
    np.testing.assert_allclose(y[:nv], ddv_dense, atol=1e-9)
    np.testing.assert_allclose(y[nv:], dlam_dense, atol=1e-9)
