"""Lie-corrected multiple-shooting state equation (floating base).

Reference: src/dynamics/state_equation.cpp:8-89 — the residual
    F_q = (q_{i+1} ⊖ q_i) - dt v_i ,   F_v = v_i + dt a_i - v_{i+1}
is linearized and the q-row premultiplied by the inverse of the Lie Jacobian
d(q_{i+1} ⊖ q_i)/d q_{i+1}, putting it in solved form
    dq_{i+1} = Aqq dq_i + Aqv dv_i + xres_q
which is what makes Riccati recursion valid on SE(3) (the reference's
`correctLinearizeStateEquation`). Only the 6x6 base block differs from
identity; the actuated tail is Euclidean.

The stored costate lmd is, consistently across iterations, the multiplier of
the corrected (solved-form) equation at the current iterate — a Gauss-Newton
freeze of the Lie-Jacobian derivative, same as the reference.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..models import robot as rm
from ..ops.linalg import pivoted_gauss_jordan_inverse


def linearize(model, q, v, dt, q_next):
    """Returns (Aqq, Aqv_scale..., xres_q) in solved form:
    dq_next = Aqq dq + Aqv dv + xres_q, with Aqv = dt * Cinv.

    For a fixed-base model: Aqq = I, Aqv = dt I, xres_q = q + dt v - q_next.
    """
    nv = model.nv
    eye = jnp.eye(nv, dtype=q.dtype)
    if not model.floating_base:
        r = q + dt * v - q_next
        return eye, dt * eye, r
    r = rm.difference(model, q, q_next) - dt * v
    J0 = rm.d_difference_dq0(model, q, q_next)
    J1 = rm.d_difference_dq1(model, q, q_next)
    # Only the 6x6 base blocks are non-trivial.
    J1b = J1[:6, :6]
    # unrolled PIVOTED GJ instead of jnp.linalg.solve: TPU has no f64
    # LuDecomposition (the refinement path needs this) and XLA lowers
    # tiny LU poorly. Partial pivoting is required — J1b = I + O(dq)
    # only near the solution; divergent intermediate iterates reach
    # far-apart (q, q_next) where unpivoted elimination breaks down
    # (measured: the unpivoted version sent one dryrun fleet scenario
    # from kkt 3e-4 to 3e+2)
    J1b_inv = pivoted_gauss_jordan_inverse(J1b)
    Cinv = eye.at[:6, :6].set(J1b_inv)     # J1^{-1} (block-diagonal)
    Aqq = -Cinv @ J0
    Aqv = dt * Cinv
    xres_q = -(Cinv @ r)
    return Aqq, Aqv, xres_q
