"""Parallel (associative-scan) Riccati recursion.

The reference's backward/forward Riccati sweeps are strictly serial
(reference: src/riccati/riccati_recursion.cpp:39-74, 94-127 — SURVEY.md
flags this as the sequential bottleneck). Here the sweep is re-expressed as
an associative combination of conditional value-function elements, giving an
O(log N)-depth `jax.lax.associative_scan` that maps onto TPU parallelism
(cf. PAPERS.md: "The Parallelization of Riccati Recursion", and the
temporal-parallelization literature for LQT).

Element e_i represents the partial problem from grid i to a boundary z:
    V_i(x, z) = min over controls of stage costs s.t. z is reached, encoded
    by the 5-tuple (A, b, C, eta, J):
        reachability:  z = A x + b + L w   (C = L L^T, free w)
        cost:          1/2 x'Jx - eta'x + 1/2 w'w
Combination (e1 then e2, i.e. e1 closer to the initial time):
    D   = (I + C1 J2)^{-1}
    A   = A2 D A1
    b   = A2 D (b1 + C1 eta2bar) + b2     with eta2bar = -grad term of e2
    C   = A2 D C1 A2^T + C2
    eta = A1^T (I + J2 C1)^{-1} (eta2 - J2 b1) + eta1
    J   = A1^T (I + J2 C1)^{-1} J2 A1 + J1
Scanning from the terminal element left gives V_i(x) = 1/2 x'P x + p'x with
P = J, p = -eta.

Validated against the serial scan in riccati/lqr.py (tests/test_riccati.py).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from ..ops.linalg import spd_inverse

from ..core.structs import LQRData, LQRPolicy


class _Elem(NamedTuple):
    A: jnp.ndarray
    b: jnp.ndarray
    C: jnp.ndarray
    eta: jnp.ndarray
    J: jnp.ndarray


def _combine(e2, e1):
    """Combine elements; with reverse=True associative_scan calls
    fn(later, earlier) — e1 is the EARLIER-in-time element.

    Conditioning (round-1 review item): instead of two general solves with
    (I + C1 J2) / (I + J2 C1), factor ONE symmetric PD matrix. With
    C1, J2 symmetric PSD, (I + C1 J2) = (I + C1 J2) and
      (I + C1 J2)^{-1} = I - C1 (I + J2 C1)^{-1} J2 ,
    where (I + J2 C1) shares the spectrum of the SPD pencil; we form the
    genuinely SPD matrix  Msym = I + J2^{1/2}... is not cheap — instead we
    solve with (I + J2 C1) ONCE (LU), reuse it for both D and Dt via the
    push-through identity, and re-symmetrize the PSD outputs C and J."""
    A1, b1, C1, eta1, J1 = e1
    A2, b2, C2, eta2, J2 = e2
    nx = A1.shape[-1]
    eye = jnp.eye(nx, dtype=A1.dtype)
    Mt = eye + J2 @ C1
    Dt = jnp.linalg.solve(Mt, eye)                  # (I + J2 C1)^{-1}
    # push-through: (I + C1 J2)^{-1} = I - C1 Dt J2
    DtJ2 = Dt @ J2
    D = eye - C1 @ DtJ2
    A2D = A2 @ D
    A = A2D @ A1
    b = (A2D @ (b1 + (C1 @ eta2[..., None])[..., 0])[..., None])[..., 0] + b2
    C = A2D @ C1 @ jnp.swapaxes(A2, -1, -2) + C2
    C = 0.5 * (C + jnp.swapaxes(C, -1, -2))
    core = (Dt @ (eta2 - (J2 @ b1[..., None])[..., 0])[..., None])[..., 0]
    eta = (jnp.swapaxes(A1, -1, -2) @ core[..., None])[..., 0] + eta1
    J = (jnp.swapaxes(A1, -1, -2) @ DtJ2 @ A1) + J1
    J = 0.5 * (J + jnp.swapaxes(J, -1, -2))
    return _Elem(A, b, C, eta, J)


def _make_elements(data: LQRData):
    def one(A, B, c, Qxx, Qxu, Quu, lx, lu):
        Ui = spd_inverse(Quu)
        Ui_Bt = Ui @ jnp.swapaxes(B, -1, -2)   # Quu^-1 B^T
        Ui_Mt = Ui @ jnp.swapaxes(Qxu, -1, -2)
        Ui_lu = Ui @ lu
        A_el = A - B @ Ui_Mt
        b_el = c - (B @ Ui_lu[..., None])[..., 0]
        C_el = B @ Ui_Bt
        J_el = Qxx - Qxu @ Ui_Mt
        J_el = 0.5 * (J_el + jnp.swapaxes(J_el, -1, -2))
        eta_el = -(lx - (Qxu @ Ui_lu[..., None])[..., 0])
        return _Elem(A_el, b_el, C_el, eta_el, J_el)

    elems = jax.vmap(one)(data.A, data.B, data.xres, data.Qxx, data.Qxu,
                          data.Quu, data.lx, data.lu)
    nx = data.Qxx_N.shape[-1]
    term = _Elem(jnp.zeros((1, nx, nx), data.Qxx_N.dtype),
                 jnp.zeros((1, nx), data.Qxx_N.dtype),
                 jnp.zeros((1, nx, nx), data.Qxx_N.dtype),
                 -data.lx_N[None],
                 data.Qxx_N[None])
    return jax.tree.map(lambda a, t: jnp.concatenate([a, t], axis=0),
                        elems, term)


def backward(data: LQRData) -> LQRPolicy:
    """All value functions via one reverse associative scan, then batched
    gain computation."""
    elems = _make_elements(data)
    scanned = jax.lax.associative_scan(_combine, elems, reverse=True)
    P = scanned.J                       # (N+1, nx, nx)
    p = -scanned.eta                    # (N+1, nx)

    def gains(A, B, c, Qxu, Quu, lu, P_next, p_next):
        G = Quu + jnp.swapaxes(B, -1, -2) @ P_next @ B
        H = Qxu + jnp.swapaxes(A, -1, -2) @ P_next @ B
        gu = lu + (jnp.swapaxes(B, -1, -2)
                   @ (P_next @ c[..., None] + p_next[..., None]))[..., 0]
        Gi = spd_inverse(G)
        K = -(Gi @ jnp.swapaxes(H, -1, -2))
        k = -(Gi @ gu)
        return K, k

    K, k = jax.vmap(gains)(data.A, data.B, data.xres, data.Qxu, data.Quu,
                           data.lu, P[1:], p[1:])
    return LQRPolicy(K=K, k=k, P=P, p=p)


def forward(data: LQRData, policy: LQRPolicy, dx0):
    """Forward rollout as an associative scan of affine maps."""
    Acl = data.A + data.B @ policy.K
    bcl = data.xres + (data.B @ policy.k[..., None])[..., 0]

    def comb(f, g):
        # forward scan: first arg aggregates EARLIER maps; compose g ∘ f
        Mf, mf = f
        Mg, mg = g
        return Mg @ Mf, (Mg @ mf[..., None])[..., 0] + mg

    Ms, ms = jax.lax.associative_scan(comb, (Acl, bcl))
    dx_tail = (Ms @ dx0[..., None])[..., 0] + ms          # dx_1..dx_N
    dx = jnp.concatenate([dx0[None], dx_tail], axis=0)
    du = (policy.K @ dx[:-1, :, None])[..., 0] + policy.k
    dlmd = (policy.P @ dx[..., None])[..., 0] + policy.p
    return dx, du, dlmd


def solve(data: LQRData, dx0):
    policy = backward(data)
    dx, du, dlmd = forward(data, policy, dx0)
    return dx, du, dlmd, policy
