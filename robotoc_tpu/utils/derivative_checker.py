"""Finite-difference checker for cost-component derivatives.

Reference: include/robotoc/utils/derivative_checker.hpp:14-52 +
src/utils/derivative_checker.cpp — the reference's test oracle for
first/second-order cost derivatives at stage/terminal/impact grids. Here the
oracle direction is reversed: components compute derivatives via autodiff,
and this checker validates them against central finite differences over the
configuration tangent (catching convention bugs autodiff alone cannot).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..models import robot as rm


def _fd_grad(f, x, eps):
    x = np.asarray(x, float)
    g = np.zeros_like(x)
    for i in range(x.size):
        e = np.zeros_like(x)
        e[i] = eps
        g[i] = (f(x + e) - f(x - e)) / (2 * eps)
    return g


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

    def check_first_order_stage(self, cost, nf, q, v, a, u, f, t, dt):
        m = self.model
        quad = cost.quadratize_stage(m, nf, q, v, a, u, f, t, dt)

        def on_q(e):
            return float(cost.eval_stage(
                m, rm.integrate(m, q, jnp.asarray(e, m.dtype)), v, a, u, f,
                t, dt))

        self._check("lq", quad.lq, _fd_grad(on_q, np.zeros(m.nv), self.eps))
        self._check("lv", quad.lv, _fd_grad(
            lambda e: float(cost.eval_stage(
                m, q, v + jnp.asarray(e, m.dtype), a, u, f, t, dt)),
            np.zeros(m.nv), self.eps))
        self._check("la", quad.la, _fd_grad(
            lambda e: float(cost.eval_stage(
                m, q, v, a + jnp.asarray(e, m.dtype), u, f, t, dt)),
            np.zeros(m.nv), self.eps))
        self._check("lu", quad.lu, _fd_grad(
            lambda e: float(cost.eval_stage(
                m, q, v, a, u + jnp.asarray(e, m.dtype), f, t, dt)),
            np.zeros(m.dimu), self.eps))
        self._check("lf", quad.lf, _fd_grad(
            lambda e: float(cost.eval_stage(
                m, q, v, a, u, f + jnp.asarray(e, m.dtype), t, dt)),
            np.zeros(f.shape[0]), self.eps))
        return True

    def check_first_order_terminal(self, cost, q, v, t):
        m = self.model
        quad = cost.quadratize_terminal(m, q, v, t)
        self._check("lq_terminal", quad.lq, _fd_grad(
            lambda e: float(cost.eval_terminal(
                m, rm.integrate(m, q, jnp.asarray(e, m.dtype)), v, t)),
            np.zeros(m.nv), self.eps))
        self._check("lv_terminal", quad.lv, _fd_grad(
            lambda e: float(cost.eval_terminal(
                m, q, v + jnp.asarray(e, m.dtype), t)),
            np.zeros(m.nv), self.eps))
        return True

    def check_first_order_impact(self, cost, q, v, dv, t):
        m = self.model
        quad = cost.quadratize_impact(m, q, v, dv, t)
        self._check("lq_impact", quad.lq, _fd_grad(
            lambda e: float(cost.eval_impact(
                m, rm.integrate(m, q, jnp.asarray(e, m.dtype)), v, dv, t)),
            np.zeros(m.nv), self.eps))
        self._check("lv_impact", quad.lv, _fd_grad(
            lambda e: float(cost.eval_impact(
                m, q, v + jnp.asarray(e, m.dtype), dv, t)),
            np.zeros(m.nv), self.eps))
        self._check("ldv_impact", quad.ldv, _fd_grad(
            lambda e: float(cost.eval_impact(
                m, q, v, dv + jnp.asarray(e, m.dtype), t)),
            np.zeros(m.nv), self.eps))
        return True
