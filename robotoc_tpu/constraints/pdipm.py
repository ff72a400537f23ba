"""Primal-dual interior-point primitives, fully vectorized.

Re-expression of the reference's PDIPM free functions
(reference: include/robotoc/constraints/pdipm.hpp:17-80) over arbitrary-shape
slack/dual arrays. Constraint convention: e(x) <= 0 with slack s = -e > 0 and
dual z > 0; every function is elementwise over the constraint stack, so one
call serves the whole horizon (and scenario batches) at once on the VPU.

Rows can be disabled with a mask (inactive constraints / padded stacks): a
masked row keeps s=1, z=barrier and contributes nothing to residuals,
condensing, or step-size limits — this is how static-shape constraint stacks
replace the reference's dynamic per-grid `dimc` resizing.
"""
from __future__ import annotations

import jax.numpy as jnp


def init_slack_dual(e, barrier, mask=None):
    """s = max(-e, sqrt(barrier)-ish floor), z = barrier / s
    (reference pdipm.hxx setSlackAndDualPositive)."""
    s = jnp.maximum(-e, jnp.sqrt(barrier))
    z = barrier / s
    if mask is not None:
        s = jnp.where(mask, s, 1.0)
        z = jnp.where(mask, z, barrier)
    return s, z


def residual(e, s, mask=None):
    """Primal residual r = e + s (want 0)."""
    r = e + s
    return jnp.where(mask, r, 0.0) if mask is not None else r


def complementarity(s, z, barrier, mask=None):
    c = s * z - barrier
    return jnp.where(mask, c, 0.0) if mask is not None else c


def condensing_diag(s, z, mask=None):
    """Diagonal Hessian contribution z/s per row."""
    d = z / s
    return jnp.where(mask, d, 0.0) if mask is not None else d


def condensing_rhs(e, s, z, barrier, mask=None):
    """Condensed gradient contribution per row:
    (z * (e + s) - (s z - barrier)) / s   (reference pdipm condensing)."""
    r = (z * (e + s) - (s * z - barrier)) / s
    return jnp.where(mask, r, 0.0) if mask is not None else r


def expand_slack_dual(e, s, z, barrier, de, mask=None):
    """Given the direction de of the constraint value e, recover slack and
    dual directions: ds = -(e + s) - de ; dz = -(s z - barrier + z ds)/s."""
    ds = -(e + s) - de
    dz = -(s * z - barrier + z * ds) / s
    if mask is not None:
        ds = jnp.where(mask, ds, 0.0)
        dz = jnp.where(mask, dz, 0.0)
    return ds, dz


def fraction_to_boundary(x, dx, tau, mask=None):
    """Largest alpha in (0, 1] with x + alpha dx >= (1 - tau) x, elementwise
    reduced (reference pdipm fractionToBoundaryRule)."""
    ratio = -tau * x / jnp.minimum(dx, -1e-30)   # positive where dx < 0
    ok = dx < 0
    if mask is not None:
        ok = ok & mask
    alphas = jnp.where(ok, ratio, 1.0)
    return jnp.minimum(1.0, jnp.min(alphas))


def log_barrier(s, barrier, mask=None):
    lb = -barrier * jnp.log(jnp.maximum(s, 1e-30))
    if mask is not None:
        lb = jnp.where(mask, lb, 0.0)
    return jnp.sum(lb)
