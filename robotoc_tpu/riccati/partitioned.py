"""Cross-chip time-partitioned Riccati recursion (shard_map over a mesh).

SURVEY.md §5 flags the reference's strictly serial Riccati sweep
(reference src/riccati/riccati_recursion.cpp:39-74, 94-127) and names a
partitioned Riccati across chips as the flagship TPU-native gap. This
module shards the TIME axis over a mesh axis and factorizes the
block-tridiagonal KKT system with the classic three-phase segmented scan
(block condensing — the Schur-complement-across-time-partitions of the
parallel-Riccati literature, PAPERS.md):

  1. LOCAL: each device composes its block of conditional value-function
     elements (riccati/parallel.py algebra) with an on-chip suffix scan —
     O(L) work, no communication;
  2. EXCHANGE: ONE all_gather of the P per-block aggregate elements over
     ICI (a few nx^2 matrices per device — microseconds on ICI);
  3. COMBINE: every device composes the (tiny, replicated) suffix of
     later-block aggregates and folds it into its local suffix elements,
     yielding the exact global value functions P_i, p_i.

The forward rollout is the mirrored prefix scan over the closed-loop
affine maps. Results are bit-identical in exact arithmetic to the serial
sweep (tests/test_partitioned.py checks to fp tolerance on an 8-device
CPU mesh). Switching-constraint rows ride the exact null-space transform
(riccati/parallel.py:_null_space_transform), so the partitioned path
supports the constrained problems too.

Regime (see BENCH_NOTES): partitioning the horizon pays when the horizon
is LONG and the scenario batch is SMALL (N >= several hundred, B small) —
offline trajectory optimization / STO on fine grids. For the MPC fleet
regime (N ~ 20-30, B >= 128) scenario data-parallelism saturates the
chips with zero cross-chip traffic per update and stays the default.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.structs import LQRData, LQRPolicy
from ..ops.linalg import spd_inverse
from . import parallel as par


def _identity_elem(nx, dtype):
    return par._Elem(A=jnp.eye(nx, dtype=dtype),
                     b=jnp.zeros((nx,), dtype),
                     C=jnp.zeros((nx, nx), dtype),
                     eta=jnp.zeros((nx,), dtype),
                     J=jnp.zeros((nx, nx), dtype))


def _pad_elems(elems, S_pad):
    """Pad with identity elements at the END (identities are two-sided
    units of the combine, so they never affect earlier suffixes)."""
    S = elems.A.shape[0]
    if S == S_pad:
        return elems
    nx = elems.A.shape[-1]
    pad = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (S_pad - S,) + x.shape),
        _identity_elem(nx, elems.A.dtype))
    return jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=0),
                        elems, pad)


def _suffix_scan_sharded(axis_name, elems):
    """shard_map body: global suffix composition of elements.
    elems: LOCAL block (L, ...). Returns local slots' global suffixes."""
    local = jax.lax.associative_scan(par._combine, elems, reverse=True)
    agg = jax.tree.map(lambda x: x[0], local)          # block aggregate
    # ONE collective: gather the P aggregates (replicated afterwards)
    aggs = jax.tree.map(
        lambda x: jax.lax.all_gather(x, axis_name), agg)   # (P, ...)
    # exclusive suffix of later blocks (tiny, replicated on every device)
    inc = jax.lax.associative_scan(par._combine, aggs, reverse=True)
    nx = elems.A.shape[-1]
    ident = _identity_elem(nx, elems.A.dtype)
    tail_all = jax.tree.map(
        lambda x, i: jnp.concatenate([x[1:], i[None]], axis=0),
        inc, ident)
    p_idx = jax.lax.axis_index(axis_name)
    tail = jax.tree.map(lambda x: x[p_idx], tail_all)
    return jax.vmap(lambda e: par._combine(tail, e))(local)


def _prefix_scan_sharded(axis_name, Ms, ms):
    """shard_map body: global INCLUSIVE prefix composition of affine maps
    (M, m): x_out = M x_in + m, composed left-to-right in time."""

    def comb(f, g):
        Mf, mf = f
        Mg, mg = g
        return Mg @ Mf, (Mg @ mf[..., None])[..., 0] + mg

    localM, localm = jax.lax.associative_scan(comb, (Ms, ms))
    aggM, aggm = localM[-1], localm[-1]
    aggsM = jax.lax.all_gather(aggM, axis_name)
    aggsm = jax.lax.all_gather(aggm, axis_name)
    incM, incm = jax.lax.associative_scan(comb, (aggsM, aggsm))
    nx = Ms.shape[-1]
    ident = (jnp.eye(nx, dtype=Ms.dtype), jnp.zeros((nx,), Ms.dtype))
    headM = jnp.concatenate([ident[0][None], incM[:-1]], axis=0)
    headm = jnp.concatenate([ident[1][None], incm[:-1]], axis=0)
    p_idx = jax.lax.axis_index(axis_name)
    hM, hm = headM[p_idx], headm[p_idx]
    outM = localM @ hM
    outm = (localM @ hm[..., None])[..., 0] + localm
    return outM, outm


def make_solve(mesh: Mesh, axis_name: str):
    """Build a time-partitioned solve(data, dx0) for `mesh`'s `axis_name`.

    data is the usual horizon-stacked LQRData (time axis first); the
    returned function shards the time axis over the mesh internally, so
    it can be called on replicated inputs too. Drop-in for
    riccati/lqr.solve (same outputs)."""
    n_dev = mesh.shape[axis_name]
    shard_t = NamedSharding(mesh, P(axis_name))

    suffix = jax.shard_map(
        functools.partial(_suffix_scan_sharded, axis_name),
        mesh=mesh, in_specs=P(axis_name), out_specs=P(axis_name))
    prefix = jax.shard_map(
        functools.partial(_prefix_scan_sharded, axis_name),
        mesh=mesh, in_specs=(P(axis_name), P(axis_name)),
        out_specs=(P(axis_name), P(axis_name)))

    def solve(data: LQRData, dx0):
        constrained = data.Phix is not None
        if constrained:
            tdata, D, d, Pn = par._null_space_transform(data)
        else:
            tdata = data
        elems = par._make_elements(tdata)              # (N+1, ...)
        S = elems.A.shape[0]
        S_pad = -(-S // n_dev) * n_dev
        elems = _pad_elems(elems, S_pad)
        elems = jax.lax.with_sharding_constraint(elems, shard_t)
        scanned = suffix(elems)
        Pm = scanned.J[:S]
        pm = -scanned.eta[:S]

        def gains(A, B, c, Qxu, Quu, lu, P_next, p_next):
            G = Quu + jnp.swapaxes(B, -1, -2) @ P_next @ B
            H = Qxu + jnp.swapaxes(A, -1, -2) @ P_next @ B
            gu = lu + (jnp.swapaxes(B, -1, -2)
                       @ (P_next @ c[..., None]
                          + p_next[..., None]))[..., 0]
            Gi = spd_inverse(G)
            K = -(Gi @ jnp.swapaxes(H, -1, -2))
            k = -(Gi @ gu)
            return K, k

        K, k = jax.vmap(gains)(tdata.A, tdata.B, tdata.xres, tdata.Qxu,
                               tdata.Quu, tdata.lu, Pm[1:], pm[1:])
        if constrained:
            K_eff = D + Pn @ K
            k_eff = d + (Pn @ k[..., None])[..., 0]
            Mx, mx = jax.vmap(_multipliers)(
                data.A, data.B, data.xres, data.Qxu, data.Quu, data.lu,
                data.Phiu, data.sw, Pm[1:], pm[1:], K_eff, k_eff)
            policy = LQRPolicy(K=K_eff, k=k_eff, P=Pm, p=pm, Mx=Mx, mx=mx)
        else:
            policy = LQRPolicy(K=K, k=k, P=Pm, p=pm)

        # forward rollout: prefix scan of closed-loop affine maps
        Acl = data.A + data.B @ policy.K
        bcl = data.xres + (data.B @ policy.k[..., None])[..., 0]
        N = Acl.shape[0]
        N_pad = -(-N // n_dev) * n_dev
        nx = Acl.shape[-1]
        if N_pad != N:
            padM = jnp.broadcast_to(jnp.eye(nx, dtype=Acl.dtype),
                                    (N_pad - N, nx, nx))
            padm = jnp.zeros((N_pad - N, nx), Acl.dtype)
            Aclp = jnp.concatenate([Acl, padM], axis=0)
            bclp = jnp.concatenate([bcl, padm], axis=0)
        else:
            Aclp, bclp = Acl, bcl
        Aclp = jax.lax.with_sharding_constraint(Aclp, shard_t)
        bclp = jax.lax.with_sharding_constraint(bclp, shard_t)
        Ms, ms = prefix(Aclp, bclp)
        Ms, ms = Ms[:N], ms[:N]
        dx_tail = (Ms @ dx0[..., None])[..., 0] + ms
        dx = jnp.concatenate([dx0[None], dx_tail], axis=0)
        du = (policy.K @ dx[:-1, :, None])[..., 0] + policy.k
        dlmd = (policy.P @ dx[..., None])[..., 0] + policy.p
        return dx, du, dlmd, policy

    return solve


def _multipliers(A, B, c, Qxu, Quu, lu, Phiu, sw, P_next, p_next, Ke, ke):
    """Switching-multiplier factorization (same convention as
    riccati/parallel.py: Mx dx + mx is the Newton DELTA on xi)."""
    Phiu_m = Phiu * sw[:, None]
    Sphi = Phiu_m @ Phiu_m.T + jnp.diag(1.0 - sw)
    Sphi_i = spd_inverse(Sphi)
    G = Quu + B.T @ P_next @ B
    Ht = Qxu.T + B.T @ P_next @ A
    gu = lu + B.T @ (P_next @ c + p_next)
    Mcoef = G @ Ke + Ht
    mvec = G @ ke + gu
    Mx = -(Sphi_i @ (Phiu_m @ Mcoef)) * sw[:, None]
    mx = -(Sphi_i @ (Phiu_m @ mvec)) * sw
    return Mx, mx


class PartitionedRiccati:
    """Adapter matching the `riccati` backend interface of
    solver/ocp_solver.py (`.solve(data, dx0)`): pass an instance as
    `OS._solve(..., riccati=PartitionedRiccati(mesh, "tp"))` to run the
    full OCP solve with the horizon sharded over the mesh."""

    def __init__(self, mesh: Mesh, axis_name: str):
        self.solve = make_solve(mesh, axis_name)
