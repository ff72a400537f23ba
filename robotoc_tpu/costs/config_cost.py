"""Configuration-space quadratic cost.

Re-expression of the reference's ConfigurationSpaceCost
(reference: include/robotoc/cost/configuration_space_cost.hpp,
src/cost/configuration_space_cost.cpp): quadratic penalties on
(q, v, a, u) with separate stage / terminal / impact weights, dt-scaled at
stages. Floating-base q-error uses the Lie difference and its tangent
Jacobian. Evaluation is batched over the horizon axis by construction.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..models import robot as rm


@struct.dataclass
class ConfigurationSpaceCost:
    q_ref: jnp.ndarray              # (nq,)
    v_ref: jnp.ndarray              # (nv,)
    q_weight: jnp.ndarray           # (nv,)
    v_weight: jnp.ndarray
    a_weight: jnp.ndarray
    u_weight: jnp.ndarray           # (dimu,)
    q_weight_terminal: jnp.ndarray
    v_weight_terminal: jnp.ndarray
    q_weight_impact: jnp.ndarray
    v_weight_impact: jnp.ndarray
    dv_weight_impact: jnp.ndarray
    q_ref_fn: object = None
    """Optional time-varying configuration reference: a callable pytree
    t -> q_ref (nq,), the analog of the reference's
    ConfigurationSpaceRefBase (configuration_space_ref_base.hpp:16,
    updateRef(robot, grid_info, q_ref)). When set it overrides the
    constant `q_ref`. See mpc.refs.StepConfigurationRef for the
    gait-synchronized periodic version (the reference's
    MPCPeriodicConfigurationRef, mpc_periodic_configuration_ref.hpp:22)."""

    # --- component interface (costs/base.py) ---
    def eval_stage(self, model, q, v, a, u, f, t, dt):
        return eval_stage(model, self, q, v, a, u, dt, t)

    def eval_terminal(self, model, q, v, t):
        return eval_terminal(model, self, q, v, t)

    def eval_impact(self, model, q, v, dv, t):
        return eval_impact(model, self, q, v, dv, t)

    def quadratize_stage(self, model, nf, q, v, a, u, f, t, dt):
        from .base import StageQuad
        c, lq, lv, la, lu, Wq, Wv, Wa, Wu = quadratize_stage(
            model, self, q, v, a, u, dt, t)
        out = StageQuad.zeros(model.nv, model.dimu, nf, model.dtype)
        return out._replace(cost=c, lq=lq, lv=lv, la=la, lu=lu,
                            Qqq=Wq, Qvv=Wv, Qaa=Wa, Quu=Wu)

    def quadratize_terminal(self, model, q, v, t):
        from .base import TerminalQuad
        c, lq, lv, Wq, Wv = quadratize_terminal(model, self, q, v, t)
        return TerminalQuad(cost=c, lq=lq, lv=lv, Qqq=Wq, Qvv=Wv)

    def quadratize_impact(self, model, q, v, dv, t):
        from .base import ImpactQuad
        c, lq, lv, ldv, Wq, Wv, Wdv = quadratize_impact(model, self, q, v,
                                                        dv, t)
        return ImpactQuad(cost=c, lq=lq, lv=lv, ldv=ldv, Qqq=Wq, Qvv=Wv,
                          Qdvdv=Wdv)


def make_config_cost(model: rm.RobotModel, q_ref=None, q_ref_fn=None,
                     **weights) -> ConfigurationSpaceCost:
    """q_ref_fn: optional callable pytree t -> q_ref (nq,) — the
    time-varying reference (overrides the constant q_ref when set)."""
    dt = model.dtype
    nv, dimu = model.nv, model.dimu
    z = lambda n: jnp.zeros(n, dtype=dt)
    if q_ref is None:
        q_ref = rm.neutral(model)

    def w(name, n):
        val = weights.get(name)
        if val is None:
            return z(n)
        val = jnp.asarray(val, dtype=dt)
        return jnp.broadcast_to(val, (n,))

    return ConfigurationSpaceCost(
        q_ref=jnp.asarray(q_ref, dtype=dt),
        v_ref=w("v_ref", nv),
        q_weight=w("q_weight", nv), v_weight=w("v_weight", nv),
        a_weight=w("a_weight", nv), u_weight=w("u_weight", dimu),
        q_weight_terminal=w("q_weight_terminal", nv),
        v_weight_terminal=w("v_weight_terminal", nv),
        q_weight_impact=w("q_weight_impact", nv),
        v_weight_impact=w("v_weight_impact", nv),
        dv_weight_impact=w("dv_weight_impact", nv),
        q_ref_fn=q_ref_fn,
    )


def _qdiff_and_jac(model, cost, q, t=None):
    """q ⊖ q_ref(t) and the tangent Jacobian J s.t. d(qdiff) = J dq."""
    if cost.q_ref_fn is not None:
        q_ref = cost.q_ref_fn(t)
    else:
        q_ref = cost.q_ref
    if not model.floating_base:
        return q - q_ref, None
    qdiff = rm.difference(model, q_ref, q)
    J = rm.d_difference_dq1(model, q_ref, q)
    return qdiff, J


def eval_stage(model, cost, q, v, a, u, dt, t=None):
    qdiff, _ = _qdiff_and_jac(model, cost, q, t)
    c = 0.5 * (jnp.sum(cost.q_weight * qdiff ** 2)
               + jnp.sum(cost.v_weight * (v - cost.v_ref) ** 2)
               + jnp.sum(cost.a_weight * a ** 2)
               + jnp.sum(cost.u_weight * u ** 2))
    return dt * c


def quadratize_stage(model, cost, q, v, a, u, dt, t=None):
    """Returns (cost, lq, lv, la, lu, Wq(nv or nv,nv), Wv, Wa, Wu) with
    weights dt-scaled; Wq is diagonal for fixed base, dense for floating."""
    qdiff, J = _qdiff_and_jac(model, cost, q, t)
    c = eval_stage(model, cost, q, v, a, u, dt, t)
    if J is None:
        lq = dt * cost.q_weight * qdiff
        Wq = jnp.diag(dt * cost.q_weight)
    else:
        lq = dt * (J.T @ (cost.q_weight * qdiff))
        Wq = dt * (J.T @ (cost.q_weight[:, None] * J))   # Gauss-Newton
    lv = dt * cost.v_weight * (v - cost.v_ref)
    la = dt * cost.a_weight * a
    lu = dt * cost.u_weight * u
    return c, lq, lv, la, lu, Wq, jnp.diag(dt * cost.v_weight), \
        jnp.diag(dt * cost.a_weight), jnp.diag(dt * cost.u_weight)


def eval_terminal(model, cost, q, v, t=None):
    qdiff, _ = _qdiff_and_jac(model, cost, q, t)
    return 0.5 * (jnp.sum(cost.q_weight_terminal * qdiff ** 2)
                  + jnp.sum(cost.v_weight_terminal * (v - cost.v_ref) ** 2))


def quadratize_terminal(model, cost, q, v, t=None):
    qdiff, J = _qdiff_and_jac(model, cost, q, t)
    c = eval_terminal(model, cost, q, v, t)
    if J is None:
        lq = cost.q_weight_terminal * qdiff
        Wq = jnp.diag(cost.q_weight_terminal)
    else:
        lq = J.T @ (cost.q_weight_terminal * qdiff)
        Wq = J.T @ (cost.q_weight_terminal[:, None] * J)
    lv = cost.v_weight_terminal * (v - cost.v_ref)
    return c, lq, lv, Wq, jnp.diag(cost.v_weight_terminal)


def eval_impact(model, cost, q, v, dv, t=None):
    qdiff, _ = _qdiff_and_jac(model, cost, q, t)
    return 0.5 * (jnp.sum(cost.q_weight_impact * qdiff ** 2)
                  + jnp.sum(cost.v_weight_impact * (v - cost.v_ref) ** 2)
                  + jnp.sum(cost.dv_weight_impact * dv ** 2))


def quadratize_impact(model, cost, q, v, dv, t=None):
    qdiff, J = _qdiff_and_jac(model, cost, q, t)
    c = eval_impact(model, cost, q, v, dv, t)
    if J is None:
        lq = cost.q_weight_impact * qdiff
        Wq = jnp.diag(cost.q_weight_impact)
    else:
        lq = J.T @ (cost.q_weight_impact * qdiff)
        Wq = J.T @ (cost.q_weight_impact[:, None] * J)
    lv = cost.v_weight_impact * (v - cost.v_ref)
    ldv = cost.dv_weight_impact * dv
    return c, lq, lv, ldv, Wq, jnp.diag(cost.v_weight_impact), \
        jnp.diag(cost.dv_weight_impact)
