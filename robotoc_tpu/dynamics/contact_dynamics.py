"""Lifted contact dynamics: KKT-block inversion for condensing/expansion.

TPU-native re-derivation of the reference's contact-dynamics elimination
(reference: src/dynamics/contact_dynamics.cpp:12-202, robot.hpp:658
computeMJtJinv). Key departure: contact activity is a per-grid MASK over a
STATIC max contact stack — inactive rows of the contact Jacobian are zeroed
and the (2,2) block gets a unit diagonal in those rows, so
[[M, J^T], [J, -D]] stays invertible with no shape changes (the gait can
change without recompilation, replacing the reference's dynamic `dimf`
resizing).

Elimination math (used by ocp/contact_stage.py): with stage variables
w = (dq, dv, du), y = (da, df), duals eta = (beta, mu), equality constraints
    T_w w + T_y y + e0 = 0      (linearized inverse dynamics + contact)
and quadratic cost 1/2 y' H_y y + g_y' y, eliminating (y, eta):
    y    = G w + c0,            G = -T_y^{-1} T_w,  c0 = -T_y^{-1} e0
    eta  = -T_y^{-T} (H_y y + g_y + S_y^T Lam_next)
    condensed Hessian  += G^T H_y G
    condensed gradient += G^T (H_y c0 + g_y)
    A/B/xres pick up S_y G / S_y c0 (the Fvq/Fvv/Fvu update of reference
    contact_dynamics.cpp:130-135).
Here T_y = [[M, J^T], [J, -D]] (y reordered as (da, nu), nu = -df), which is
symmetric — ONE factorization serves both condensing and dual expansion.

Single-sample functions; batched via vmap at the stage level.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve


def mjtj_inverse(M, J, inactive_diag):
    """Blocks of Psi = [[M, J^T], [J, -D]]^{-1} via the contact-space Schur
    complement (reference robot.hpp:658 computeMJtJinv).

    M: (nv, nv) SPD; J: (nf, nv) with inactive rows zeroed;
    inactive_diag: (nf,) 1.0 on inactive rows, 0.0 on active.

    Psi = [[inv11, inv12], [inv12^T, -Sinv]]  (symmetric).
    """
    c, lower = cho_factor(M)
    MinvJt = cho_solve((c, lower), jnp.swapaxes(J, -1, -2))   # (nv, nf)
    S = J @ MinvJt + jnp.diag(inactive_diag)                  # (nf, nf) SPD
    cS, lowerS = cho_factor(S)
    Sinv = cho_solve((cS, lowerS), jnp.eye(S.shape[-1], dtype=S.dtype))
    Minv = cho_solve((c, lower), jnp.eye(M.shape[-1], dtype=M.dtype))
    inv12 = MinvJt @ Sinv
    inv11 = Minv - inv12 @ jnp.swapaxes(MinvJt, -1, -2)
    return inv11, inv12, Sinv


def ty_solve(inv11, inv12, Sinv, r1, r2):
    """Solve [[M, J^T], [J, -D]] [x1; x2] = [r1; r2] given the Psi blocks.
    Works for matrix-valued right-hand sides too."""
    x1 = inv11 @ r1 + inv12 @ r2
    x2 = jnp.swapaxes(inv12, -1, -2) @ r1 - Sinv @ r2
    return x1, x2
