"""Switching constraint: pure-state equality on the next impact's placement.

TPU-native counterpart of the reference's SwitchingConstraint
(reference: src/dynamics/switching_constraint.cpp:7-62,
include/robotoc/dynamics/switching_constraint.hpp). At the intermediate grid
TWO steps before an impact grid, the impacting contacts' placements at the
PREDICTED configuration

    q_pred = q ⊕ ((dt1 + dt2) v + dt1 dt2 a)        (switching_constraint.cpp:18-21)

must equal the target (post-impact) placements. First-order,
dq_pred = dq + (dt1 + dt2) dv + dt1 dt2 da — so the constraint reaches the
acceleration (hence, after contact-dynamics condensing, the control) at that
grid, which is what makes the constrained Riccati factorization well posed
(reference riccati_factorizer.cpp:58-89).

Design departures from the reference:
  * residual rows are stacked to the SAME static max_dimf layout as the
    force/contact stacks (3 rows per point contact: world position error;
    6 per surface contact: log6 placement error), masked by the impact mask;
  * Jacobians Phiq/Phiv/Phia come from ONE fused forward-mode autodiff of
    the composed predict->FK->error chain (the reference hand-chains
    dIntegrateTransport, switching_constraint.cpp:42-52); the switching-time
    row Phit (:56-60) is not materialized — the STO layer linearizes the
    whole build wrt the switching times instead (solver/sto_solver.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import contacts as ct
from ..models import robot as rm
from ..ops import lie


def predicted_config(model, q, v, a, dt1, dt2):
    """q ⊕ ((dt1+dt2) v + dt1 dt2 a) — the two-step state prediction."""
    return rm.integrate(model, q, (dt1 + dt2) * v + dt1 * dt2 * a)


def placement_error(model, contacts: ct.ContactModel, q_pred, p_target,
                    R_target):
    """Stacked placement error at q_pred: (max_dimf,).

    Point contacts: world position error (3 rows,
    reference robot.hpp:518 computeContactPositionResidual). Surface
    contacts: log6 of the relative placement (6 rows)."""
    R_w, p_w = rm.forward_kinematics(model, q_pred)
    rows = []
    for c in range(contacts.n_contacts):
        Rw, pw = rm.frame_placement(model, contacts.frame_ids[c], R_w, p_w)
        if contacts.types[c] == ct.POINT:
            rows.append(pw - p_target[..., c, :])
        else:
            Rr = R_target[..., c, :, :]
            R_rel = jnp.swapaxes(Rr, -1, -2) @ Rw
            p_rel = (jnp.swapaxes(Rr, -1, -2)
                     @ (pw - p_target[..., c, :])[..., None])[..., 0]
            rows.append(lie.se3_log(R_rel, p_rel))
    return jnp.concatenate(rows, axis=-1)


def residual_and_jacs(model, contacts: ct.ContactModel, q, v, a,
                      dt1, dt2, p_target, R_target, sw_mask):
    """(P_res, Phiq, Phiv, Phia) of the switching constraint, masked.

    sw_mask: (nc,) impacting-contact activity. Returns P_res (max_dimf,),
    Phi* (max_dimf, nv) with inactive rows zeroed. One fused 3nv-tangent
    jacfwd of the predict->FK->error chain."""
    nv = model.nv
    rowmask = contacts.force_mask(sw_mask)

    def res(qq, vv, aa):
        return placement_error(
            model, contacts, predicted_config(model, qq, vv, aa, dt1, dt2),
            p_target, R_target)

    P0 = res(q, v, a)
    z = jnp.zeros(3 * nv, dtype=q.dtype)

    def f_all(e):
        return res(rm.integrate(model, q, e[:nv]), v + e[nv:2 * nv],
                   a + e[2 * nv:])

    J = jax.jacfwd(f_all)(z)                      # (max_dimf, 3nv)
    m = rowmask[:, None]
    return (P0 * rowmask, J[:, :nv] * m, J[:, nv:2 * nv] * m,
            J[:, 2 * nv:] * m)


def condense(P_res, Phiq, Phiv, Phia, da_dw, da_0, nv, nu):
    """Eliminate da through the contact-dynamics condensation
    da = da_dw @ (dq, dv, du) + da_0 (reference contact_dynamics.cpp:138-153
    switching-constraint condensing):

        Phix = [Phiq + Phia Jq, Phiv + Phia Jv],  Phiu = Phia Ju,
        Pc = P_res + Phia da_0.
    """
    PJ = Phia @ da_dw                              # (nf, 2nv+nu)
    Phix = jnp.concatenate([Phiq + PJ[:, :nv], Phiv + PJ[:, nv:2 * nv]],
                           axis=1)
    Phiu = PJ[:, 2 * nv:]
    Pc = P_res + Phia @ da_0
    return Phix, Phiu, Pc
