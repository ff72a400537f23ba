"""Linearized friction-cone constraint (5 facets per point contact).

Reference: src/constraints/friction_cone.cpp:12-99 + friction_cone.hpp:102-120.
Per contact, with the WORLD-frame force f_W = R_frame(q) @ f_local and a
ground-surface rotation R_s (identity for flat ground):
    f_s = R_s^T f_W
    g = [ -fz ; fx - c fz ; -fx - c fz ; fy - c fz ; -fy - c fz ] <= 0,
    c = mu / sqrt(2)     (inner pyramid approximation).

The q-dependence (through the contact-frame rotation) is kept, as in the
reference. Rows of inactive contacts are masked out. Stack layout:
(nc * 5,) per grid.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import contacts as ct
from ..models import robot as rm
from . import pdipm


def cone_matrix(friction_coef, dtype):
    """(5, 3) facet matrix C s.t. g = C @ f_surface."""
    c = friction_coef / jnp.sqrt(jnp.asarray(2.0, dtype))
    return jnp.stack([
        jnp.stack([jnp.zeros_like(c), jnp.zeros_like(c), -jnp.ones_like(c)]),
        jnp.stack([jnp.ones_like(c), jnp.zeros_like(c), -c]),
        jnp.stack([-jnp.ones_like(c), jnp.zeros_like(c), -c]),
        jnp.stack([jnp.zeros_like(c), jnp.ones_like(c), -c]),
        jnp.stack([jnp.zeros_like(c), jnp.zeros_like(c) - 1.0, -c]),
    ])


def residual_and_jac(model, contacts, q, f_stack, friction_coefs):
    """g (nc*5,), dg/df (nc*5, nf), dg/dq (nc*5, nv) for point contacts.

    f_stack: (nf,) local contact-frame forces. friction_coefs: (nc,).
    """
    dtype = q.dtype
    R_w, p_w = rm.forward_kinematics(model, q)
    gs, dgdf_blocks, frames = [], [], []
    for c in range(contacts.n_contacts):
        fid = contacts.frame_ids[c]
        Rf, _ = rm.frame_placement(model, fid, R_w, p_w)
        fl = f_stack[3 * c:3 * c + 3]
        fW = Rf @ fl
        C = cone_matrix(friction_coefs[c], dtype)
        gs.append(C @ fW)
        dgdf_blocks.append(C @ Rf)
        frames.append((fid, C, fl))
    g = jnp.concatenate(gs)

    nf = 3 * contacts.n_contacts
    dgdf = jnp.zeros((5 * contacts.n_contacts, nf), dtype)
    for c, blk in enumerate(dgdf_blocks):
        dgdf = dgdf.at[5 * c:5 * c + 5, 3 * c:3 * c + 3].set(blk)

    def g_of_q(e):
        qe = rm.integrate(model, q, e)
        Rw2, pw2 = rm.forward_kinematics(model, qe)
        out = []
        for (fid, C, fl) in frames:
            Rf2, _ = rm.frame_placement(model, fid, Rw2, pw2)
            out.append(C @ (Rf2 @ fl))
        return jnp.concatenate(out)

    dgdq = jax.jacfwd(g_of_q)(jnp.zeros(model.nv, dtype))
    return g, dgdf, dgdq


def row_mask(contacts, active_mask):
    """(nc*5,) row mask from the per-contact activity mask (nc,)."""
    return jnp.repeat(active_mask, 5)
