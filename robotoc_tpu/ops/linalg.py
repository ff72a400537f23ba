"""Small dense linear algebra tuned for TPU batching.

The whole solver stack factorizes TINY matrices (12-60 rows: contact-space
KKT blocks, Riccati Quu, ParNMPC stage KKT) batched over horizon x scenario
axes. XLA lowers `cholesky` / `triangular_solve` to sequential loops with
dynamic slicing that dominate the build phase on TPU (round-2 profile);
these unrolled static-indexed eliminations fuse into straight-line
VPU/MXU code instead and batch cleanly under vmap.

All functions are single-sample over the trailing two dims; batch with
vmap or leading broadcast axes.
"""
from __future__ import annotations

import jax.numpy as jnp


def gauss_jordan_inverse(A):
    """Inverse of a small matrix by unrolled in-place Gauss-Jordan
    elimination WITHOUT pivoting. Valid whenever every leading principal
    minor is nonsingular — in particular SPD matrices and symmetric
    quasi-definite KKT blocks ([[M, J^T], [J, -D]] with SPD M: the pivots
    are M's Cholesky pivots followed by the negative definite Schur
    complement's). n static rank-1 updates, one per pivot."""
    n = A.shape[-1]
    for k in range(n):
        p = A[..., k, k]
        row = A[..., k, :] / p[..., None]
        col = A[..., :, k]
        A = A - col[..., :, None] * row[..., None, :]
        A = A.at[..., k, :].set(row)
        A = A.at[..., :, k].set(-col / p[..., None])
        A = A.at[..., k, k].set(1.0 / p)
    return A


def spd_inverse(A):
    """Inverse of a small SPD matrix (unrolled GJ + symmetrization)."""
    Ai = gauss_jordan_inverse(A)
    return 0.5 * (Ai + jnp.swapaxes(Ai, -1, -2))


def spd_solve(A, rhs):
    """Solve A x = rhs for small SPD A via the explicit GJ inverse.
    rhs: (..., n) or (..., n, m). For these sizes the inverse+matmul is
    faster on TPU than a factor+substitution chain and keeps everything
    on the MXU."""
    Ai = spd_inverse(A)
    if rhs.ndim == A.ndim - 1:
        return (Ai @ rhs[..., None])[..., 0]
    return Ai @ rhs


def pivoted_gauss_jordan_inverse(A):
    """Inverse of a small (n, n) matrix by unrolled Gauss-Jordan WITH
    partial pivoting (dynamic row gathers; jit/vmap-safe — batch via
    vmap). Use where leading principal minors can be ill-conditioned,
    e.g. the SE(3) difference Jacobian base block at far-apart
    configurations reached by divergent intermediate Newton iterates
    (dynamics/state_equation.py). Replaces jnp.linalg.solve there: XLA's
    LuDecomposition has no f64 TPU lowering (breaks the on-chip
    refinement path) and unrolls poorly for tiny sizes."""
    n = A.shape[-1]
    Aug = jnp.concatenate([A, jnp.eye(n, dtype=A.dtype)], axis=-1)
    for k in range(n):
        p = jnp.argmax(jnp.abs(Aug[k:, k])) + k
        rk, rp = Aug[k], Aug[p]
        Aug = Aug.at[k].set(rp).at[p].set(rk)
        row = Aug[k] / Aug[k, k]
        Aug = Aug - Aug[:, k:k + 1] * row[None, :]
        Aug = Aug.at[k].set(row)
    return Aug[:, n:]
