"""Cost terms on the switching times.

Reference: include/robotoc/sto/sto_cost_function.hpp +
sto_cost_function_component_base.hpp:19-80 — a container of user components
evaluated over the switching-time vector. Components here are pytree
dataclasses returning (cost, lt, Qtt); the container is a tuple (static
structure, traced values), same convention as costs/base.py. The reference's
examples mostly use an EMPTY STO cost (jump_sto.py builds a bare
STOCostFunction); the quadratic penalty below is the common concrete case.
"""
from __future__ import annotations

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


def quadratize(components, ts):
    E = ts.shape[0]
    cost = jnp.zeros((), ts.dtype)
    lt = jnp.zeros(E, ts.dtype)
    Qtt = jnp.zeros((E, E), ts.dtype)
    for comp in components:
        c, g, H = comp.quadratize(ts)
        cost, lt, Qtt = cost + c, lt + g, Qtt + H
    return cost, lt, Qtt
