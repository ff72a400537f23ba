"""Linearized contact cones: friction pyramid (point) + wrench cone (surface).

Reference: src/constraints/friction_cone.cpp:12-99 (5 facets per point
contact, world frame) and src/constraints/contact_wrench_cone.cpp
computeCone/updateCone (17 rows per surface contact, local frame, rectangular
foot X x Y). Per point contact, with the WORLD-frame force
f_W = R_frame(q) @ f_local:
    g = [ -fz ; fx - c fz ; -fx - c fz ; fy - c fz ; -fy - c fz ] <= 0,
    c = mu / sqrt(2)     (inner pyramid approximation).
Per surface contact the 17-row wrench cone acts on the LOCAL wrench directly
(the foot frame is assumed surface-aligned, as in the reference).

The q-dependence of the point cone (through the contact-frame rotation) is
kept, as in the reference (friction_cone.cpp:142-175). Rows of inactive
contacts are masked out downstream. Stack layout: sum of per-contact cone
dims (5 or 17) per grid.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import contacts as ct
from ..models import robot as rm
from . import pdipm


def cone_matrix(friction_coef, dtype):
    """(5, 3) facet matrix C s.t. g = C @ f_surface (point contacts)."""
    c = friction_coef / jnp.sqrt(jnp.asarray(2.0, dtype))
    return jnp.stack([
        jnp.stack([jnp.zeros_like(c), jnp.zeros_like(c), -jnp.ones_like(c)]),
        jnp.stack([jnp.ones_like(c), jnp.zeros_like(c), -c]),
        jnp.stack([-jnp.ones_like(c), jnp.zeros_like(c), -c]),
        jnp.stack([jnp.zeros_like(c), jnp.ones_like(c), -c]),
        jnp.stack([jnp.zeros_like(c), jnp.zeros_like(c) - 1.0, -c]),
    ])


def wrench_cone_matrix(mu, X, Y, dtype):
    """(17, 6) rectangular-foot contact wrench cone W s.t. g = W @ wrench
    (reference contact_wrench_cone.cpp computeCone: friction pyramid, CoP
    box, yaw-torque limits)."""
    z = jnp.zeros_like(mu)
    o = jnp.ones_like(mu)
    XYmu = (X + Y) * mu
    rows = [
        [z, z, -o, z, z, z],
        [-o, z, -mu, z, z, z],
        [o, z, -mu, z, z, z],
        [z, -o, -mu, z, z, z],
        [z, o, -mu, z, z, z],
        [z, z, -Y, -o, z, z],
        [z, z, -Y, o, z, z],
        [z, z, -X, z, -o, z],
        [z, z, -X, z, o, z],
        [-Y, -X, -XYmu, mu, mu, -o],
        [-Y, X, -XYmu, mu, -mu, -o],
        [Y, -X, -XYmu, -mu, mu, -o],
        [Y, X, -XYmu, -mu, -mu, -o],
        [Y, X, -XYmu, mu, mu, o],
        [Y, -X, -XYmu, mu, -mu, o],
        [-Y, X, -XYmu, -mu, mu, o],
        [-Y, -X, -XYmu, -mu, -mu, o],
    ]
    return jnp.asarray(jnp.stack([jnp.stack(r) for r in rows]), dtype)


def residual_and_jac(model, contacts, q, f_stack, friction_coefs):
    """g (dimc_cone,), dg/df (dimc_cone, nf), dg/dq (dimc_cone, nv).

    f_stack: (nf,) local contact-frame forces/wrenches.
    friction_coefs: (nc,).
    """
    dtype = q.dtype
    R_w, p_w = rm.forward_kinematics(model, q)
    gs, blocks, frames = [], [], []
    offs = contacts.f_offsets
    for c in range(contacts.n_contacts):
        fid = contacts.frame_ids[c]
        if contacts.types[c] == ct.POINT:
            Rf, _ = rm.frame_placement(model, fid, R_w, p_w)
            fl = f_stack[offs[c]:offs[c] + 3]
            fW = Rf @ fl
            C = cone_matrix(friction_coefs[c], dtype)
            gs.append(C @ fW)
            blocks.append(C @ Rf)
            frames.append((fid, C, fl))
        else:
            wl = f_stack[offs[c]:offs[c] + 6]
            W = wrench_cone_matrix(friction_coefs[c],
                                   contacts.rect[c, 0],
                                   contacts.rect[c, 1], dtype)
            gs.append(W @ wl)
            blocks.append(W)
            frames.append(None)          # no q-dependence (local wrench)
    g = jnp.concatenate(gs)

    nf = contacts.max_dimf
    dimc = contacts.dimc_cone
    dgdf = jnp.zeros((dimc, nf), dtype)
    r = 0
    for c, blk in enumerate(blocks):
        nr, ncol = blk.shape
        dgdf = dgdf.at[r:r + nr, offs[c]:offs[c] + ncol].set(blk)
        r += nr

    def g_of_q(e):
        qe = rm.integrate(model, q, e)
        Rw2, pw2 = rm.forward_kinematics(model, qe)
        out = []
        for c, fr in enumerate(frames):
            if fr is None:
                out.append(jnp.zeros(17, dtype))
            else:
                fid, C, fl = fr
                Rf2, _ = rm.frame_placement(model, fid, Rw2, pw2)
                out.append(C @ (Rf2 @ fl))
        return jnp.concatenate(out)

    dgdq = jax.jacfwd(g_of_q)(jnp.zeros(model.nv, dtype))
    return g, dgdf, dgdq


def row_mask(contacts, active_mask):
    """(dimc_cone,) row mask from the per-contact activity mask (nc,)."""
    return contacts.cone_mask(active_mask)
