"""Cost terms on the switching times.

Reference: include/robotoc/sto/sto_cost_function.hpp +
sto_cost_function_component_base.hpp:19-80 — a container of user components
evaluated over the switching-time vector. The reference's component
interface is three virtuals (evalCost / evalCostDerivatives /
evalCostHessian over the TimeDiscretization); here a component is any
pytree with

    quadratize(ts) -> (cost, lt, Qtt)       # ts: (E,) switching times

and the container is a plain tuple (static structure, traced values), the
same convention as costs/base.py. For user-defined costs the three
"virtuals" collapse to ONE function of ts: wrap any differentiable scalar
``fn(ts)`` in `FunctionSTOCost` and autodiff supplies lt and Qtt — the
TPU-native replacement for the reference's hand-coded derivative
overrides. The reference's examples mostly use an EMPTY STO cost
(jump_sto.py builds a bare STOCostFunction); `QuadraticSTOCost` is the
common concrete case.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class QuadraticSTOCost:
    """1/2 sum_k w_k (ts_k - ts_ref_k)^2."""
    ts_ref: jnp.ndarray   # (E,)
    weight: jnp.ndarray   # (E,)

    def quadratize(self, ts):
        r = ts - self.ts_ref
        cost = 0.5 * jnp.sum(self.weight * r * r)
        lt = self.weight * r
        Qtt = jnp.diag(self.weight)
        return cost, lt, Qtt


class FunctionSTOCost:
    """User-defined switching-time cost from a single differentiable
    scalar function of the switching-time vector (the component-base
    analog, sto_cost_function_component_base.hpp:19-80: evalCost /
    evalCostDerivatives / evalCostHessian all derive from `fn` by
    autodiff). `fn` must be jit-traceable: fn(ts (E,)) -> scalar."""

    def __init__(self, fn):
        self.fn = fn

    def quadratize(self, ts):
        cost = self.fn(ts)
        lt = jax.grad(self.fn)(ts)
        Qtt = jax.jacfwd(jax.grad(self.fn))(ts)
        return cost, lt, Qtt


jax.tree_util.register_pytree_node(
    FunctionSTOCost,
    lambda c: ((), (c.fn,)),
    lambda aux, ch: FunctionSTOCost(aux[0]))


def quadratize(components, ts):
    E = ts.shape[0]
    cost = jnp.zeros((), ts.dtype)
    lt = jnp.zeros(E, ts.dtype)
    Qtt = jnp.zeros((E, E), ts.dtype)
    for comp in components:
        c, g, H = comp.quadratize(ts)
        cost, lt, Qtt = cost + c, lt + g, Qtt + H
    return cost, lt, Qtt


def eval_cost(components, ts):
    """Cost only (the reference's STOCostFunction::evalCost path)."""
    return sum((comp.quadratize(ts)[0] for comp in components),
               jnp.zeros((), ts.dtype))
