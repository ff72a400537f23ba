"""Cost container + the per-stage quadratization interface.

Re-expression of the reference's CostFunction/CostFunctionComponentBase
(reference: include/robotoc/cost/cost_function.hpp:30,
cost_function_component_base.hpp:68-199). Components are flax dataclasses
(pytrees) with quadratize_* methods; the container is a plain tuple, so the
component STRUCTURE is static for XLA while weights/references stay traced.
Time-varying references take the grid time t (traced) — periodic gait refs
are `where`-based formulas, not Python branches.

Every quadratize method returns a StageQuad with Gauss-Newton Hessian
blocks; missing blocks are zeros so containers just sum.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class StageQuad(NamedTuple):
    cost: jnp.ndarray
    lq: jnp.ndarray     # (nv,)
    lv: jnp.ndarray
    la: jnp.ndarray
    lu: jnp.ndarray     # (dimu,)
    lf: jnp.ndarray     # (nf,)
    Qqq: jnp.ndarray    # (nv, nv)
    Qvv: jnp.ndarray
    Qaa: jnp.ndarray
    Quu: jnp.ndarray    # (dimu, dimu)
    Qff: jnp.ndarray    # (nf, nf)

    @staticmethod
    def zeros(nv, dimu, nf, dtype):
        z = jnp.zeros
        return StageQuad(
            cost=z((), dtype), lq=z(nv, dtype), lv=z(nv, dtype),
            la=z(nv, dtype), lu=z(dimu, dtype), lf=z(nf, dtype),
            Qqq=z((nv, nv), dtype), Qvv=z((nv, nv), dtype),
            Qaa=z((nv, nv), dtype), Quu=z((dimu, dimu), dtype),
            Qff=z((nf, nf), dtype))

    def __add__(self, o):
        return StageQuad(*(a + b for a, b in zip(self, o)))


class TerminalQuad(NamedTuple):
    cost: jnp.ndarray
    lq: jnp.ndarray
    lv: jnp.ndarray
    Qqq: jnp.ndarray
    Qvv: jnp.ndarray

    @staticmethod
    def zeros(nv, dtype):
        z = jnp.zeros
        return TerminalQuad(z((), dtype), z(nv, dtype), z(nv, dtype),
                            z((nv, nv), dtype), z((nv, nv), dtype))

    def __add__(self, o):
        return TerminalQuad(*(a + b for a, b in zip(self, o)))


class ImpactQuad(NamedTuple):
    cost: jnp.ndarray
    lq: jnp.ndarray
    lv: jnp.ndarray
    ldv: jnp.ndarray
    Qqq: jnp.ndarray
    Qvv: jnp.ndarray
    Qdvdv: jnp.ndarray

    @staticmethod
    def zeros(nv, dtype):
        z = jnp.zeros
        return ImpactQuad(z((), dtype), z(nv, dtype), z(nv, dtype),
                          z(nv, dtype), z((nv, nv), dtype),
                          z((nv, nv), dtype), z((nv, nv), dtype))

    def __add__(self, o):
        return ImpactQuad(*(a + b for a, b in zip(self, o)))


class DiscountedCost:
    """Exponential time discount wrapper around any cost component
    (reference cost_function.hpp:42,303-308: stage costs scaled by
    gamma^((t - t0)/dt_d)). Wrapping at the component level keeps the
    container a plain tuple; the scale is a traced function of the grid
    time, so horizon shifts in MPC never recompile."""

    def __init__(self, base, discount_factor: float,
                 discount_time_step: float, t0: float = 0.0):
        self.base = base
        self.gamma = float(discount_factor)
        self.dt_d = float(discount_time_step)
        self.t0 = float(t0)

    def _scale(self, t):
        return self.gamma ** ((t - self.t0) / self.dt_d)

    def replace(self, **kw):
        return DiscountedCost(self.base.replace(**kw), self.gamma,
                              self.dt_d, self.t0)

    def quadratize_stage(self, model, nf, q, v, a, u, f, t, dt):
        quad = self.base.quadratize_stage(model, nf, q, v, a, u, f, t, dt)
        s = self._scale(t)
        return type(quad)(*(s * x for x in quad))

    def quadratize_terminal(self, model, q, v, t):
        quad = self.base.quadratize_terminal(model, q, v, t)
        s = self._scale(t)
        return type(quad)(*(s * x for x in quad))

    def quadratize_impact(self, model, q, v, dv, t):
        quad = self.base.quadratize_impact(model, q, v, dv, t)
        s = self._scale(t)
        return type(quad)(*(s * x for x in quad))

    def eval_stage(self, model, q, v, a, u, f, t, dt):
        return self._scale(t) * self.base.eval_stage(model, q, v, a, u, f,
                                                     t, dt)

    def eval_terminal(self, model, q, v, t):
        return self._scale(t) * self.base.eval_terminal(model, q, v, t)

    def eval_impact(self, model, q, v, dv, t):
        return self._scale(t) * self.base.eval_impact(model, q, v, dv, t)


import jax

jax.tree_util.register_pytree_node(
    DiscountedCost,
    lambda c: ((c.base,), (c.gamma, c.dt_d, c.t0)),
    lambda aux, ch: DiscountedCost(ch[0], *aux))


def quadratize_stage(components, model, nf, q, v, a, u, f, t, dt,
                     kin=None):
    """kin (optional): (frame_ids, task, Jq) — pre-computed task-space
    kinematics from the stage kernel's shared chain. Components whose
    `kin_frame_ids` match take the fused fast path
    (quadratize_stage_kin); others run their own kinematics as usual."""
    out = StageQuad.zeros(model.nv, model.dimu, nf, model.dtype)
    for comp in components:
        if (kin is not None
                and getattr(comp, "kin_frame_ids", None) == kin[0]):
            out = out + comp.quadratize_stage_kin(
                model, nf, q, v, a, u, f, t, dt, kin[1], kin[2])
        else:
            out = out + comp.quadratize_stage(model, nf, q, v, a, u, f,
                                              t, dt)
    return out


def quadratize_terminal(components, model, q, v, t):
    out = TerminalQuad.zeros(model.nv, model.dtype)
    for comp in components:
        out = out + comp.quadratize_terminal(model, q, v, t)
    return out


def quadratize_impact(components, model, q, v, dv, t, kin=None):
    out = ImpactQuad.zeros(model.nv, model.dtype)
    for comp in components:
        if (kin is not None
                and getattr(comp, "kin_frame_ids", None) == kin[0]):
            out = out + comp.quadratize_impact_kin(model, q, v, dv, t,
                                                   kin[1], kin[2])
        else:
            out = out + comp.quadratize_impact(model, q, v, dv, t)
    return out


def kin_fold_frames(components):
    """The frame tuple a stage kernel should bake task kinematics for, or
    None if no component takes the fused path (static, trace-time)."""
    for comp in components:
        fids = getattr(comp, "kin_frame_ids", None)
        if fids is not None:
            return tuple(fids)
    return None


def eval_stage(components, model, q, v, a, u, f, t, dt):
    return sum(comp.eval_stage(model, q, v, a, u, f, t, dt)
               for comp in components)


def eval_terminal(components, model, q, v, t):
    return sum(comp.eval_terminal(model, q, v, t) for comp in components)


def eval_impact(components, model, q, v, dv, t):
    return sum(comp.eval_impact(model, q, v, dv, t) for comp in components)
