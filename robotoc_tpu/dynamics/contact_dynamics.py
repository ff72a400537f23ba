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

from ..ops.linalg import gauss_jordan_inverse


def mjtj_inverse(M, J, inactive_diag):
    """Blocks of Psi = [[M, J^T], [J, -D]]^{-1}
    (reference robot.hpp:658 computeMJtJinv — there a dense Schur
    complement via Eigen LLT; here one unrolled Gauss-Jordan sweep of the
    full symmetric KKT block, see gauss_jordan_inverse).

    M: (nv, nv) SPD; J: (nf, nv) with inactive rows zeroed;
    inactive_diag: (nf,) 1.0 on inactive rows, 0.0 on active.

    Psi = [[inv11, inv12], [inv12^T, -Sinv]]  (symmetric).
    """
    nv = M.shape[-1]
    nf = J.shape[-2]
    Jt = jnp.swapaxes(J, -1, -2)
    D = inactive_diag[..., None] * jnp.eye(nf, dtype=M.dtype)
    T = jnp.concatenate([
        jnp.concatenate([M, Jt], axis=-1),
        jnp.concatenate([J, -D], axis=-1)], axis=-2)
    Psi = gauss_jordan_inverse(T)
    inv11 = Psi[..., :nv, :nv]
    inv12 = Psi[..., :nv, nv:]
    Sinv = -Psi[..., nv:, nv:]
    # exact symmetry (GJ drift is O(eps); downstream ty_solve assumes it)
    inv11 = 0.5 * (inv11 + jnp.swapaxes(inv11, -1, -2))
    Sinv = 0.5 * (Sinv + jnp.swapaxes(Sinv, -1, -2))
    return inv11, inv12, Sinv


def mjtj_inverse_chol(M, J, inactive_diag):
    """Reference implementation via the explicit contact-space Schur
    complement and Cholesky (kept as the numerical oracle for
    tests/test_contact_stage_oracle.py; same blocks as mjtj_inverse)."""
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
