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
from jax.scipy.linalg import cho_factor, cho_solve

from ..core.structs import LQRData, LQRPolicy


def _chol_solve(G, rhs):
    c, lower = cho_factor(G)
    return cho_solve((c, lower), rhs)


def backward(data: LQRData) -> LQRPolicy:
    """Backward Riccati sweep over the stacked horizon."""

    def step(carry, blk):
        P_next, p_next = carry
        A, B, xres, Qxx, Qxu, Quu, lx, lu = blk
        AtP = A.T @ P_next
        BtP = B.T @ P_next
        F = Qxx + AtP @ A
        H = Qxu + AtP @ B
        G = Quu + BtP @ B
        Pxr_p = P_next @ xres + p_next
        gu = lu + B.T @ Pxr_p
        c, lower = cho_factor(G)
        K = -cho_solve((c, lower), H.T)
        k = -cho_solve((c, lower), gu)
        P = F + H @ K
        P = 0.5 * (P + P.T)
        p = lx + A.T @ Pxr_p + H @ k
        return (P, p), (P, p, K, k)

    PN = 0.5 * (data.Qxx_N + data.Qxx_N.T)
    (_, _), (Ps, ps, Ks, ks) = jax.lax.scan(
        step, (PN, data.lx_N),
        (data.A, data.B, data.xres, data.Qxx, data.Qxu, data.Quu,
         data.lx, data.lu),
        reverse=True)
    P_all = jnp.concatenate([Ps, PN[None]], axis=0)
    p_all = jnp.concatenate([ps, data.lx_N[None]], axis=0)
    return LQRPolicy(K=Ks, k=ks, P=P_all, p=p_all)


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
