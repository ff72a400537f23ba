"""Time-varying LQR via Riccati recursion (scan baseline).

The condensed per-grid subproblems (from either pipeline) form a
block-tridiagonal KKT system; this module factorizes it with the classic
backward/forward Riccati sweep as `lax.scan`s (reference:
src/riccati/riccati_recursion.cpp:32-147 — there a serial C++ loop, here a
scan whose per-step dense blocks batch over scenario axes on the MXU).
A partitioned, chip-parallel variant lives in riccati/parallel.py.

QP solved (directions d x, d u over grids 0..N-1, terminal N):
  min  sum_i [ 1/2 dx'Qxx dx + dx'Qxu du + 1/2 du'Quu du + lx'dx + lu'du ]
       + 1/2 dxN'QxxN dxN + lxN'dxN
  s.t. dx_{i+1} = A_i dx_i + B_i du_i + xres_i ,  dx_0 given.

The value function is V_i(dx) = 1/2 dx'P_i dx + p_i'dx; the costate
direction at grid i is  dlmd_i = P_i dx_i + p_i  (with lx built from
current-iterate duals, these are exact Newton directions).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.structs import LQRData, LQRPolicy
from ..ops.linalg import spd_inverse


def _chol_solve(G, rhs):
    return spd_inverse(G) @ rhs


def backward(data: LQRData) -> LQRPolicy:
    """Backward Riccati sweep over the stacked horizon. When the data
    carries switching-constraint rows (Phix/Phiu/Pc/sw), every step takes
    the pure-state-equality Schur branch with masked rows — the static-shape
    analog of the reference's constrained factorization
    (reference riccati_factorizer.cpp:58-89: S = Phiu G^-1 Phiu^T, second
    LLT, constrained gains + multiplier factorization xi = Mx dx + mx)."""
    constrained = data.Phix is not None

    def step(carry, blk):
        P_next, p_next = carry
        if constrained:
            A, B, xres, Qxx, Qxu, Quu, lx, lu, Phix, Phiu, Pc, sw = blk
        else:
            A, B, xres, Qxx, Qxu, Quu, lx, lu = blk
        AtP = A.T @ P_next
        BtP = B.T @ P_next
        F = Qxx + AtP @ A
        H = Qxu + AtP @ B
        G = Quu + BtP @ B
        Pxr_p = P_next @ xres + p_next
        gu = lu + B.T @ Pxr_p
        Ginv = spd_inverse(G)
        K = -(Ginv @ H.T)
        k = -(Ginv @ gu)
        lxt = lx + A.T @ Pxr_p
        if constrained:
            GiPhiuT = Ginv @ Phiu.T                         # (nu, nf)
            mm = sw[:, None] * sw[None, :]
            S = (Phiu @ GiPhiuT) * mm + jnp.diag(1.0 - sw)
            Sinv = spd_inverse(S)
            Mx = Sinv @ ((Phiu @ K + Phix) * sw[:, None])
            mx = Sinv @ ((Phiu @ k + Pc) * sw)
            K = K - GiPhiuT @ Mx
            k = k - GiPhiuT @ mx
            P = F + H @ K + Phix.T @ Mx
            p = lxt + H @ k + Phix.T @ mx
            P = 0.5 * (P + P.T)
            return (P, p), (P, p, K, k, Mx, mx, GiPhiuT, Sinv)
        P = F + H @ K
        P = 0.5 * (P + P.T)
        p = lxt + H @ k
        return (P, p), (P, p, K, k)

    PN = 0.5 * (data.Qxx_N + data.Qxx_N.T)
    xs = (data.A, data.B, data.xres, data.Qxx, data.Qxu, data.Quu,
          data.lx, data.lu)
    if constrained:
        xs = xs + (data.Phix, data.Phiu, data.Pc, data.sw)
        (_, _), (Ps, ps, Ks, ks, Mxs, mxs, GiPs, Schs) = jax.lax.scan(
            step, (PN, data.lx_N), xs, reverse=True)
    else:
        (_, _), (Ps, ps, Ks, ks) = jax.lax.scan(
            step, (PN, data.lx_N), xs, reverse=True)
        Mxs = mxs = GiPs = Schs = None
    P_all = jnp.concatenate([Ps, PN[None]], axis=0)
    p_all = jnp.concatenate([ps, data.lx_N[None]], axis=0)
    return LQRPolicy(K=Ks, k=ks, P=P_all, p=p_all,
                     Mx=Mxs, mx=mxs, GiPhiuT=GiPs, S_chol=Schs)


def forward(data: LQRData, policy: LQRPolicy, dx0):
    """Forward rollout: returns (dx (N+1, nx), du (N, nu), dlmd (N+1, nx))."""

    def step(dx, blk):
        A, B, xres, K, k = blk
        du = K @ dx + k
        dx_next = A @ dx + B @ du + xres
        return dx_next, (dx, du)

    _, (dxs, dus) = jax.lax.scan(
        step, dx0, (data.A, data.B, data.xres, policy.K, policy.k))
    dx_last = data.A[-1] @ dxs[-1] + data.B[-1] @ dus[-1] + data.xres[-1]
    dx_all = jnp.concatenate([dxs, dx_last[None]], axis=0)
    dlmd = jnp.einsum("nij,nj->ni", policy.P, dx_all) + policy.p
    return dx_all, dus, dlmd


def solve(data: LQRData, dx0):
    policy = backward(data)
    dx, du, dlmd = forward(data, policy, dx0)
    return dx, du, dlmd, policy


# ---------------------------------------------------------------------------
# Multi-RHS affine solves (shared matrix factorization, batched vector parts)
# ---------------------------------------------------------------------------
# Used by the switching-time optimization Schur complement
# (solver/sto_solver.py): the coupled KKT system over (directions, dts) is
# block-eliminated by solving the SAME block-tridiagonal system for E+1
# right-hand sides — the base KKT residual plus the E cross-derivative
# columns d(residual)/d(ts_k). P and K depend only on the Hessian blocks, so
# the extra RHS cost is one batched vector backward/forward scan (R vectors
# ride the same per-stage dense blocks on the MXU). The reference instead
# threads dedicated STO rows through its serial recursion
# (reference: src/riccati/riccati_factorizer.cpp:93-142).

def backward_vec(data: LQRData, policy: LQRPolicy, lx_b, lu_b, xres_b,
                 lxN_b, Pc_b=None):
    """Vector-part backward sweep for a batch of RHS.

    policy: from a prior `backward` (P reused; when the data carries
    switching-constraint rows, the constrained factors GiPhiuT/S_chol and
    the Phix/Phiu rows replay the constrained branch on each column —
    the vector analog of riccati_factorizer.cpp:58-89). lx_b/lu_b/xres_b:
    (N, R, ·); lxN_b: (R, nx); Pc_b: (N, R, nf) switching-residual
    columns (None = zeros). Returns (p_b (N+1, R, nx), k_b (N, R, nu),
    mx_b (N, R, nf) or None).
    """
    P_all = policy.P
    constrained = data.Phix is not None and policy.Mx is not None

    if constrained:
        if Pc_b is None:
            Pc_b = jnp.zeros(lu_b.shape[:2] + (data.Phix.shape[1],),
                             lu_b.dtype)

        def step_c(p_next, blk):
            (A, B, Qxu, Quu, lxb, lub, xrb, Pcb, P_next,
             Phix, Phiu, sw, GiPhiuT, Sinv) = blk
            Pxr_p = xrb @ P_next.T + p_next        # (R, nx)
            gu = lub + Pxr_p @ B                   # (R, nu)
            G = Quu + B.T @ P_next @ B
            H = Qxu + A.T @ P_next @ B
            k_plain = -(gu @ spd_inverse(G))
            mx = ((k_plain @ Phiu.T + Pcb) * sw) @ Sinv.T
            k = k_plain - mx @ GiPhiuT.T
            p = lxb + Pxr_p @ A + k @ H.T + mx @ Phix
            return p, (p, k, mx)

        _, (ps, ks, mxs) = jax.lax.scan(
            step_c, lxN_b,
            (data.A, data.B, data.Qxu, data.Quu, lx_b, lu_b, xres_b,
             Pc_b, P_all[1:], data.Phix, data.Phiu, data.sw,
             policy.GiPhiuT, policy.S_chol),
            reverse=True)
        p_all = jnp.concatenate([ps, lxN_b[None]], axis=0)
        return p_all, ks, mxs

    def step(p_next, blk):
        A, B, Qxu, Quu, lxb, lub, xrb, P_next = blk
        Pxr_p = xrb @ P_next.T + p_next            # (R, nx)
        gu = lub + Pxr_p @ B                       # (R, nu)
        G = Quu + B.T @ P_next @ B
        H = Qxu + A.T @ P_next @ B
        k = -(gu @ spd_inverse(G))
        p = lxb + Pxr_p @ A + k @ H.T
        return p, (p, k)

    _, (ps, ks) = jax.lax.scan(
        step, lxN_b,
        (data.A, data.B, data.Qxu, data.Quu, lx_b, lu_b, xres_b, P_all[1:]),
        reverse=True)
    p_all = jnp.concatenate([ps, lxN_b[None]], axis=0)
    return p_all, ks, None


def forward_vec(data: LQRData, K_all, P_all, p_b, k_b, xres_b, dx0_b):
    """Batched forward rollout: dx' = (A + B K) dx + B k_b + xres_b.
    Returns (dx_b (N+1, R, nx), du_b (N, R, nu), dlmd_b (N+1, R, nx))."""

    def step(dx, blk):
        A, B, K, kb, xrb = blk
        du = dx @ K.T + kb
        dx1 = dx @ A.T + du @ B.T + xrb
        return dx1, (dx, du)

    dxN, (dxs, dus) = jax.lax.scan(
        step, dx0_b, (data.A, data.B, K_all, k_b, xres_b))
    dx_all = jnp.concatenate([dxs, dxN[None]], axis=0)
    dlmd = jnp.einsum("nij,nrj->nri", P_all, dx_all) + p_b
    return dx_all, dus, dlmd


def solve_columns(data: LQRData, policy, lx_b, lu_b, xres_b, lxN_b, dx0_b,
                  Pc_b=None):
    """Solve the factored system for extra RHS columns, reusing policy.P/K.
    Returns (dx_b, du_b, dlmd_b, dxi_b) — dxi_b is None when the data has
    no switching-constraint rows, else (N, R, nf) multiplier columns."""
    p_b, k_b, mx_b = backward_vec(data, policy, lx_b, lu_b, xres_b,
                                  lxN_b, Pc_b)
    dx_b, du_b, dlmd_b = forward_vec(data, policy.K, policy.P, p_b, k_b,
                                     xres_b, dx0_b)
    dxi_b = None
    if mx_b is not None:
        dxi_b = (jnp.einsum("nfx,nrx->nrf", policy.Mx, dx_b[:-1]) + mx_b) \
            * data.sw[:, None, :]
    return dx_b, du_b, dlmd_b, dxi_b
