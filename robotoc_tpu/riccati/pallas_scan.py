"""Pallas TPU Riccati recursion: grid-as-time-axis, batch-in-lanes.

The serial scan in riccati/lqr.py is latency-bound on TPU: each of the N
steps issues a dozen small batched matmuls through XLA, and every
intermediate round-trips HBM. Here ONE Pallas kernel runs the whole
backward sweep: the TPU grid is the (sequential) time axis, the value
function (P, p) lives in VMEM scratch that persists across grid steps,
and the per-step dense algebra is the same batch-in-lanes plane code as
ops/pallas_condense (B scenarios across the 128 lanes, matrix entries in
sublanes). The constrained (switching) Schur branch is included — masked
rows keep shapes static (riccati/lqr.py backward, reference
riccati_factorizer.cpp:58-89).

The forward rollout stays in XLA: it is a pure matvec scan (~1% of the
Riccati cost) and reuses the K/k written by the kernel.

Interface: `solve(data, dx0)` matches riccati/lqr.solve (single-scenario
(N, ...) arrays) and is a custom_vmap — under the fleet vmap the batch
lands in the lane axis instead of vmapping the kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.structs import LQRData, LQRPolicy
from ..ops.pallas_condense import (_gauss_jordan, _matmul, _matTmul,
                                   _matvec, _matTvec)

LANES = 128


def _bwd_kernel(nx, nu, nf, N, *refs):
    """One backward Riccati step per grid index (reverse time order).
    The last two refs (P_s/p_s) are VMEM scratch carrying the value
    function across steps; the Phi inputs and Mx/mx outputs exist only on
    constrained problems (zero-size blocks are not lowerable)."""
    con = nf > 0
    if con:
        (A_ref, B_ref, xres_ref, Qxx_ref, Qxu_ref, Quu_ref,
         lx_ref, lu_ref, Phix_ref, Phiu_ref, Pc_ref, sw_ref,
         QxxN_ref, lxN_ref,
         K_ref, k_ref, P_ref, p_ref, Mx_ref, mx_ref, P_s, p_s) = refs
    else:
        (A_ref, B_ref, xres_ref, Qxx_ref, Qxu_ref, Quu_ref,
         lx_ref, lu_ref, QxxN_ref, lxN_ref,
         K_ref, k_ref, P_ref, p_ref, P_s, p_s) = refs
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        PN = QxxN_ref[...]
        P_s[...] = 0.5 * (PN + jnp.swapaxes(PN, 0, 1))
        p_s[...] = lxN_ref[...]

    P_next = P_s[...]
    p_next = p_s[...]
    A = A_ref[0]
    Bm = B_ref[0]
    AtP = _matTmul(A, P_next)                    # (nx, nx, T)
    F = Qxx_ref[0] + _matmul(AtP, A)
    H = Qxu_ref[0] + _matmul(AtP, Bm)            # (nx, nu, T)
    BtP = _matTmul(Bm, P_next)                   # (nu, nx, T)
    G = Quu_ref[0] + _matmul(BtP, Bm)
    Pxr_p = _matvec(P_next, xres_ref[0]) + p_next
    gu = lu_ref[0] + _matTvec(Bm, Pxr_p)
    Ginv = _gauss_jordan(G, nu)
    K = -_matmul(Ginv, jnp.swapaxes(H, 0, 1))    # (nu, nx, T)
    k = -_matvec(Ginv, gu)
    lxt = lx_ref[0] + _matTvec(A, Pxr_p)
    if con:
        Phix = Phix_ref[0]                       # (nf, nx, T)
        Phiu = Phiu_ref[0]                       # (nf, nu, T)
        sw = sw_ref[0]                           # (nf, T)
        GiPhiuT = _matmul(Ginv, jnp.swapaxes(Phiu, 0, 1))   # (nu, nf, T)
        S = (_matmul(Phiu, GiPhiuT) * (sw[:, None, :] * sw[None, :, :]))
        ri = jax.lax.broadcasted_iota(jnp.int32, (nf, nf), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (nf, nf), 1)
        eye_f = (ri == ci).astype(S.dtype)[:, :, None]
        S = S + eye_f * (1.0 - sw)[None, :, :]
        Sinv = _gauss_jordan(S, nf)
        Mx = _matmul(Sinv, (_matmul(Phiu, K) + Phix) * sw[:, None, :])
        mx = _matvec(Sinv, (_matvec(Phiu, k) + Pc_ref[0]) * sw)
        K = K - _matmul(GiPhiuT, Mx)
        k = k - _matvec(GiPhiuT, mx)
        P = F + _matmul(H, K) + _matTmul(Phix, Mx)
        p = lxt + _matvec(H, k) + _matTvec(Phix, mx)
        Mx_ref[0] = Mx
        mx_ref[0] = mx
    else:
        P = F + _matmul(H, K)
        p = lxt + _matvec(H, k)
    P = 0.5 * (P + jnp.swapaxes(P, 0, 1))
    K_ref[0] = K
    k_ref[0] = k
    P_ref[0] = P
    p_ref[0] = p
    P_s[...] = P
    p_s[...] = p


def _backward_flat(N, nx, nu, nf, dt, interpret, *arrs):
    """arrs: batch-last (N, d1, d2, T_total) step arrays in kernel order
    (A, B, xres, Qxx, Qxu, Quu, lx, lu[, Phix, Phiu, Pc, sw], QxxN, lxN).
    The lane axis is tiled at LANES per grid step (outer grid dim), so
    fleets larger than 128 scenarios stay within the VMEM budget (B=256
    overflowed the 16M scoped limit with a single full-width sweep)."""
    T_total = arrs[0].shape[-1]
    if T_total % LANES != 0:
        raise ValueError(
            f"lane count {T_total} must be a multiple of {LANES}; "
            "callers must pad the fleet axis")
    Bt = T_total // LANES
    T = LANES

    def step_spec(shape_head):
        nd = len(shape_head)
        return pl.BlockSpec((1,) + shape_head + (T,),
                            (lambda b, i: (N - 1 - i,) + (0,) * nd + (b,)),
                            memory_space=pltpu.VMEM)

    def fix_spec(shape_head):
        nd = len(shape_head)
        return pl.BlockSpec(shape_head + (T,),
                            (lambda b, i: (0,) * nd + (b,)),
                            memory_space=pltpu.VMEM)

    con = nf > 0
    in_heads = [(nx, nx), (nx, nu), (nx,), (nx, nx), (nx, nu), (nu, nu),
                (nx,), (nu,)]
    if con:
        in_heads += [(nf, nx), (nf, nu), (nf,), (nf,)]
    in_specs = [step_spec(s) for s in in_heads]
    in_specs += [fix_spec((nx, nx)), fix_spec((nx,))]
    ins = list(arrs)
    out_heads = [(nu, nx), (nu,), (nx, nx), (nx,)]
    if con:
        out_heads += [(nf, nx), (nf,)]
    out_specs = tuple(step_spec(s) for s in out_heads)
    out_shape = tuple(jax.ShapeDtypeStruct((N,) + s + (T_total,), dt)
                      for s in out_heads)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, nx, nu, nf, N),
        grid=(Bt, N),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((nx, nx, T), dt),
                        pltpu.VMEM((nx, T), dt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(*ins)
    if con:
        K, k, P, p, Mx, mx = outs
    else:
        (K, k, P, p), Mx, mx = outs, None, None
    return K, k, P, p, Mx, mx


def _solve_batched(interpret, data: LQRData, dx0):
    """data fields (Bb, N, ...), dx0 (Bb, nx): backward in Pallas (batch
    across lanes), forward rollout + costates in XLA."""
    Bb, N = data.A.shape[0], data.A.shape[1]
    nx, nu = data.A.shape[-1], data.B.shape[-1]
    dt = data.A.dtype
    con = data.Phix is not None
    nf = data.Phix.shape[-2] if con else 0
    B_pad = -(-Bb // LANES) * LANES

    def to_lanes(x):
        if x.shape[0] != B_pad:
            x = jnp.pad(x, [(0, B_pad - Bb)] + [(0, 0)] * (x.ndim - 1))
        return jnp.moveaxis(x, 0, -1)

    args = [to_lanes(a) for a in
            (data.A, data.B, data.xres, data.Qxx, data.Qxu, data.Quu,
             data.lx, data.lu)]
    if con:
        args += [to_lanes(a) for a in
                 (data.Phix, data.Phiu, data.Pc, data.sw)]
    args += [to_lanes(data.Qxx_N), to_lanes(data.lx_N)]
    if B_pad > LANES:
        # chunk the fleet at 128 lanes per kernel call (lax.map keeps the
        # traced graph single-copy): XLA's scoped-VMEM placement stages
        # the FULL kernel outputs in VMEM, which overflows the 16M scoped
        # limit beyond one lane tile (measured: B=256 -> 18.3M)
        nch = B_pad // LANES

        def split(a):
            parts = jnp.split(a, nch, axis=-1)
            return jnp.stack(parts, axis=0)

        outs = jax.lax.map(
            lambda ac: _backward_flat(N, nx, nu, nf, dt, interpret, *ac),
            tuple(split(a) for a in args))

        def join(o):
            if o is None:
                return None
            o = jnp.moveaxis(o, 0, -2)            # (N, ..., nch, LANES)
            return o.reshape(o.shape[:-2] + (B_pad,))

        K, k, P, p, Mx, mx = [join(o) for o in outs]
    else:
        K, k, P, p, Mx, mx = _backward_flat(
            N, nx, nu, nf, dt, interpret, *args)

    def from_lanes(x):
        return jnp.moveaxis(x, -1, 0)[:Bb]

    K, k, P, p = map(from_lanes, (K, k, P, p))
    P_all = jnp.concatenate([P, 0.5 * (data.Qxx_N
                                       + jnp.swapaxes(data.Qxx_N, -1, -2))
                             [:, None]], axis=1)
    p_all = jnp.concatenate([p, data.lx_N[:, None]], axis=1)

    # forward rollout (vmapped XLA scan: matvecs only)
    def fwd_one(A, Bm, xres, Kb, kb, dx0b):
        def step(dx, blk):
            Ai, Bi, ri, Ki, ki = blk
            du = Ki @ dx + ki
            return Ai @ dx + Bi @ du + ri, (dx, du)

        dxN, (dxs, dus) = jax.lax.scan(step, dx0b, (A, Bm, xres, Kb, kb))
        return jnp.concatenate([dxs, dxN[None]], axis=0), dus

    dx_all, du = jax.vmap(fwd_one)(data.A, data.B, data.xres, K, k, dx0)
    dlmd = jnp.einsum("bnij,bnj->bni", P_all, dx_all) + p_all
    policy = LQRPolicy(K=K, k=k, P=P_all, p=p_all,
                       Mx=from_lanes(Mx) if con else None,
                       mx=from_lanes(mx) if con else None,
                       GiPhiuT=None, S_chol=None)
    return dx_all, du, dlmd, policy


def make_solve(interpret=False):
    """`solve(data, dx0)` with riccati/lqr.solve's single-scenario
    signature; under one level of vmap (the MPC fleet) the batch is
    flattened into the kernel's lane axis."""

    @jax.custom_batching.custom_vmap
    def solve(data: LQRData, dx0):
        one = jax.tree.map(lambda x: x[None], data)
        dx, du, dlmd, pol = _solve_batched(interpret, one, dx0[None])
        sq = lambda x: None if x is None else x[0]
        return (dx[0], du[0], dlmd[0],
                jax.tree.map(sq, pol))

    @solve.def_vmap
    def _rule(axis_size, in_batched, data, dx0):
        data = jax.tree.map(
            lambda x, b: x if b else jnp.broadcast_to(
                x, (axis_size,) + x.shape),
            data, in_batched[0])
        if not in_batched[1]:
            dx0 = jnp.broadcast_to(dx0, (axis_size,) + dx0.shape)
        out = _solve_batched(interpret, data, dx0)
        flags = jax.tree.map(lambda _: True, out)
        return out, flags

    return solve


@functools.lru_cache(maxsize=None)
def _cached(interpret):
    return make_solve(interpret=interpret)


def solve(data: LQRData, dx0):
    """Drop-in for riccati/lqr.solve (Pallas backward on TPU; interpreter
    on CPU for tests)."""
    return _cached(jax.default_backend() == "cpu")(data, dx0)
