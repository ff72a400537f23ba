"""Finite-difference checker for cost-component derivatives.

Reference: include/robotoc/utils/derivative_checker.hpp:14-52 +
src/utils/derivative_checker.cpp — the reference's test oracle for
first/second-order cost derivatives at stage/terminal/impact grids. Here the
oracle direction is reversed: components compute derivatives via autodiff,
and this checker validates them against central finite differences over the
configuration tangent (catching convention bugs autodiff alone cannot).

Each gradient check is ONE jitted+vmapped batched evaluation over the
stacked ±eps basis perturbations (the old per-coordinate eager loop cost
~150 s per cost component on the CPU test suite — round-4 durations).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..models import robot as rm


def _fd_grad_batched(fn, dim, eps, dtype):
    """Central-difference gradient of scalar fn over R^dim: one vmapped
    evaluation of fn at the 2*dim signed basis points."""
    eye = jnp.eye(dim, dtype=dtype) * jnp.asarray(eps, dtype)
    E = jnp.concatenate([eye, -eye], axis=0)
    vals = jax.jit(jax.vmap(fn))(E)
    vals = np.asarray(vals, dtype=float)
    return (vals[:dim] - vals[dim:]) / (2.0 * eps)


class DerivativeChecker:
    def __init__(self, model, eps: float = 1e-6, rtol: float = 1e-3,
                 atol: float = 1e-5):
        self.model = model
        self.eps = float(eps)
        self.rtol = float(rtol)
        self.atol = float(atol)

    def _check(self, name, analytic, fd):
        ok = np.allclose(np.asarray(analytic), fd, rtol=self.rtol,
                         atol=self.atol)
        if not ok:
            raise AssertionError(
                f"derivative mismatch in {name}:\n analytic="
                f"{np.asarray(analytic)}\n fd={fd}")
        return True

    def _grad(self, fn, dim):
        return _fd_grad_batched(fn, dim, self.eps, self.model.dtype)

    def check_first_order_stage(self, cost, nf, q, v, a, u, f, t, dt):
        m = self.model
        quad = cost.quadratize_stage(m, nf, q, v, a, u, f, t, dt)
        self._check("lq", quad.lq, self._grad(
            lambda e: cost.eval_stage(m, rm.integrate(m, q, e), v, a, u,
                                      f, t, dt), m.nv))
        self._check("lv", quad.lv, self._grad(
            lambda e: cost.eval_stage(m, q, v + e, a, u, f, t, dt), m.nv))
        self._check("la", quad.la, self._grad(
            lambda e: cost.eval_stage(m, q, v, a + e, u, f, t, dt), m.nv))
        self._check("lu", quad.lu, self._grad(
            lambda e: cost.eval_stage(m, q, v, a, u + e, f, t, dt),
            m.dimu))
        self._check("lf", quad.lf, self._grad(
            lambda e: cost.eval_stage(m, q, v, a, u, f + e, t, dt),
            f.shape[0]))
        return True

    def check_first_order_terminal(self, cost, q, v, t):
        m = self.model
        quad = cost.quadratize_terminal(m, q, v, t)
        self._check("lq_terminal", quad.lq, self._grad(
            lambda e: cost.eval_terminal(m, rm.integrate(m, q, e), v, t),
            m.nv))
        self._check("lv_terminal", quad.lv, self._grad(
            lambda e: cost.eval_terminal(m, q, v + e, t), m.nv))
        return True

    def check_first_order_impact(self, cost, q, v, dv, t):
        m = self.model
        quad = cost.quadratize_impact(m, q, v, dv, t)
        self._check("lq_impact", quad.lq, self._grad(
            lambda e: cost.eval_impact(m, rm.integrate(m, q, e), v, dv,
                                       t), m.nv))
        self._check("lv_impact", quad.lv, self._grad(
            lambda e: cost.eval_impact(m, q, v + e, dv, t), m.nv))
        self._check("ldv_impact", quad.ldv, self._grad(
            lambda e: cost.eval_impact(m, q, v, dv + e, t), m.nv))
        return True

    # -- second order (reference check_second_order_* family) -------------

    def _hess(self, grad_fn, dim):
        """FD Jacobian of a vector-valued gradient function: one vmapped
        evaluation at the 2*dim signed basis points."""
        dtype = self.model.dtype
        eye = jnp.eye(dim, dtype=dtype) * jnp.asarray(self.eps, dtype)
        E = jnp.concatenate([eye, -eye], axis=0)
        G = np.asarray(jax.jit(jax.vmap(grad_fn))(E), dtype=float)
        return (G[:dim] - G[dim:]) / (2.0 * self.eps)

    def check_second_order_stage(self, cost, nf, q, v, a, u, f, t, dt):
        """Gauss-Newton blocks vs FD of the analytic gradient. Exact for
        quadratic costs (config space); task-space costs drop the
        residual-curvature term by design (same as the reference's GN
        quadratization), so call this only where the model is exact."""
        m = self.model
        quad = cost.quadratize_stage(m, nf, q, v, a, u, f, t, dt)
        self._check("Qqq", quad.Qqq, self._hess(
            lambda e: cost.quadratize_stage(
                m, nf, rm.integrate(m, q, e), v, a, u, f, t, dt).lq,
            m.nv))
        self._check("Qvv", quad.Qvv, self._hess(
            lambda e: cost.quadratize_stage(
                m, nf, q, v + e, a, u, f, t, dt).lv, m.nv))
        self._check("Qaa", quad.Qaa, self._hess(
            lambda e: cost.quadratize_stage(
                m, nf, q, v, a + e, u, f, t, dt).la, m.nv))
        self._check("Quu", quad.Quu, self._hess(
            lambda e: cost.quadratize_stage(
                m, nf, q, v, a, u + e, f, t, dt).lu, m.dimu))
        return True

    def check_second_order_terminal(self, cost, q, v, t):
        m = self.model
        quad = cost.quadratize_terminal(m, q, v, t)
        self._check("Qqq_terminal", quad.Qqq, self._hess(
            lambda e: cost.quadratize_terminal(
                m, rm.integrate(m, q, e), v, t).lq, m.nv))
        self._check("Qvv_terminal", quad.Qvv, self._hess(
            lambda e: cost.quadratize_terminal(m, q, v + e, t).lv, m.nv))
        return True
