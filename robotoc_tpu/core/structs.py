"""Core horizon-stacked data structures.

Where the reference stores per-grid structs in aligned_vectors
(reference: include/robotoc/core/{split_solution,split_kkt_matrix,...}.hpp),
the TPU-native layout stacks every per-grid quantity along a leading horizon
axis so the whole horizon evaluates as one batched kernel and shards across
chips. Contact dimensions are STATIC maxima with activity masks (SURVEY.md §7).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class PerformanceIndex:
    """Five-scalar solver health (reference core/performance_index.hpp:13)."""
    cost: jnp.ndarray
    cost_barrier: jnp.ndarray
    primal_feasibility: jnp.ndarray
    dual_feasibility: jnp.ndarray
    kkt_error: jnp.ndarray      # sum of squared KKT residuals

    @staticmethod
    def zeros(dtype=jnp.float64):
        z = jnp.zeros((), dtype=dtype)
        return PerformanceIndex(z, z, z, z, z)

    def __add__(self, o):
        return PerformanceIndex(
            self.cost + o.cost, self.cost_barrier + o.cost_barrier,
            self.primal_feasibility + o.primal_feasibility,
            self.dual_feasibility + o.dual_feasibility,
            self.kkt_error + o.kkt_error)


@struct.dataclass
class LQRData:
    """Condensed time-varying LQR subproblem over the horizon.

    Produced by every stage pipeline (unconstr / contact) after condensing;
    consumed by the Riccati layer. All arrays stacked (N, ...) with the
    terminal cost in (Qxx_N, lx_N).
    """
    A: jnp.ndarray       # (N, nx, nx) state transition
    B: jnp.ndarray       # (N, nx, nu)
    xres: jnp.ndarray    # (N, nx) state-equation residual (gap)
    Qxx: jnp.ndarray     # (N, nx, nx)
    Qxu: jnp.ndarray     # (N, nx, nu)
    Quu: jnp.ndarray     # (N, nu, nu)
    lx: jnp.ndarray      # (N, nx)
    lu: jnp.ndarray      # (N, nu)
    Qxx_N: jnp.ndarray   # (nx, nx)
    lx_N: jnp.ndarray    # (nx,)
    # Optional pure-state (switching) equality constraint rows
    # Phix dx + Phiu du + Pc = 0, masked per row by sw (1 active / 0 off)
    # (reference: switching-constraint Jacobians in split_kkt_matrix.hpp +
    # the constrained Riccati branch, riccati_factorizer.cpp:58-89).
    Phix: jnp.ndarray = None    # (N, nf, nx)
    Phiu: jnp.ndarray = None    # (N, nf, nu)
    Pc: jnp.ndarray = None      # (N, nf)
    sw: jnp.ndarray = None      # (N, nf) row activity mask


@struct.dataclass
class LQRPolicy:
    """Feedback policy from the Riccati sweep
    (reference riccati/lqr_policy.hpp:16)."""
    K: jnp.ndarray       # (N, nu, nx)
    k: jnp.ndarray       # (N, nu)
    P: jnp.ndarray       # (N+1, nx, nx) value Hessians
    p: jnp.ndarray       # (N+1, nx) value gradients
    # Constrained-stage multiplier factorization xi = Mx dx + mx
    # (reference split_riccati_factorization.hpp M()/m()) + cached pieces
    # for multi-RHS vector sweeps (GiPhiuT = Quu_bar^{-1} Phiu^T, S_chol
    # holds the INVERSE of the constraint Schur complement S).
    Mx: jnp.ndarray = None       # (N, nf, nx)
    mx: jnp.ndarray = None       # (N, nf)
    GiPhiuT: jnp.ndarray = None  # (N, nu, nf)
    S_chol: jnp.ndarray = None   # (N, nf, nf) S^{-1}
