"""Minimum dwell-time constraints on switching times (own PDIPM).

Reference: include/robotoc/sto/sto_constraints.hpp:23-67 +
src/sto/sto_constraints.cpp:120-260. With boundary vector
b = [t0, ts_1..ts_E, t0+T] (P = E+1 phases), the dwell times are
dwell_p = b_{p+1} - b_p and the constraints are

    dwell_p >= min_dwell_p        (P inequalities)

handled with the same slack/dual interior-point treatment as the stage
constraints: residual r = min_dwell - dwell + slack = 0, slack,dual > 0.
The Jacobian wrt ts is the reference's bidiagonal J
(sto_constraints.cpp:158-170): dr/dts_k = delta_{k,p-1} - delta_{k,p}.

Everything here is O(E) scalar algebra — it stays inside the jitted STO
update as tiny fused ops.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class DwellConstraint:
    min_dwell: jnp.ndarray    # (P,)
    J: jnp.ndarray            # (P, E) d(min - dwell)/d ts
    barrier: float = struct.field(pytree_node=False, default=1e-3)
    ftb: float = struct.field(pytree_node=False, default=0.995)


@struct.dataclass
class DwellState:
    slack: jnp.ndarray   # (P,)
    dual: jnp.ndarray    # (P,)


def make_dwell_constraint(min_dwell, barrier=1e-3, ftb=0.995,
                          dtype=jnp.float64) -> DwellConstraint:
    md = jnp.asarray(np.asarray(min_dwell, float), dtype)
    P = md.shape[0]
    E = P - 1
    J = np.zeros((P, E))
    if E > 0:
        J[0, 0] = -1.0
        for i in range(P - 2):
            J[i + 1, i] = 1.0
            J[i + 1, i + 1] = -1.0
        J[P - 1, E - 1] = 1.0
    return DwellConstraint(min_dwell=md, J=jnp.asarray(J, dtype),
                           barrier=float(barrier), ftb=float(ftb))


def dwell_times(ts, t0, T, dtype):
    c = lambda x: jnp.asarray(x, dtype).reshape(-1)
    b = jnp.concatenate([c(t0), jnp.asarray(ts, dtype), c(t0 + T)])
    return b[1:] - b[:-1]


def init_state(con: DwellConstraint, dwell) -> DwellState:
    slack = jnp.maximum(dwell - con.min_dwell, jnp.sqrt(con.barrier))
    dual = con.barrier / slack
    return DwellState(slack=slack, dual=dual)


def linearize_condense(con: DwellConstraint, st: DwellState, dwell):
    """Returns (lt_add (E,), Qtt_add (E,E), residual, cmpl, log_barrier).
    lt_add = J^T (dual + cond) with cond the standard PDIPM condensing
    coefficient; Qtt_add = J^T diag(dual/slack) J."""
    r = con.min_dwell - dwell + st.slack
    cmpl = st.slack * st.dual - con.barrier
    cond = (st.dual * r - cmpl) / st.slack
    lt = con.J.T @ (st.dual + cond)
    d = st.dual / st.slack
    Qtt = con.J.T @ (d[:, None] * con.J)
    logb = -con.barrier * jnp.sum(jnp.log(jnp.maximum(st.slack, 1e-300)))
    return lt, Qtt, r, cmpl, logb


def expand(con: DwellConstraint, st: DwellState, dwell, dts):
    """Slack/dual directions from the switching-time direction
    (reference sto_constraints.cpp expandSlackAndDual)."""
    r = con.min_dwell - dwell + st.slack
    cmpl = st.slack * st.dual - con.barrier
    dslack = -(con.J @ dts) - r
    ddual = -(st.dual * dslack + cmpl) / st.slack
    return dslack, ddual


def step_sizes(con: DwellConstraint, st: DwellState, dslack, ddual):
    def ftb(x, dx):
        ratio = jnp.where(dx < 0, -con.ftb * x / jnp.where(
            dx < 0, dx, -1.0), 1.0)
        return jnp.minimum(1.0, jnp.min(ratio))
    return ftb(st.slack, dslack), ftb(st.dual, ddual)


def kkt_error_sq(con: DwellConstraint, st: DwellState, dwell):
    r = con.min_dwell - dwell + st.slack
    cmpl = st.slack * st.dual - con.barrier
    return jnp.sum(r ** 2) + jnp.sum(cmpl ** 2)
