"""Pallas TPU kernels for the per-stage condensing algebra.

The build phase factorizes TINY dense systems (contact-space KKT 30x30,
condensed Hessian 48x48) batched over scenario x horizon. Lowered through
stock XLA these become dozens of small batched matmuls and scatter updates,
each round-tripping its (S, d1, d2) intermediate through HBM — the round-2
TPU profile put ~29 ms of an 83 ms build here. These kernels instead keep
one 128-stage tile resident in VMEM and evaluate the whole elimination as
straight-line vector code:

  * layout: every per-stage matrix is stored batch-LAST, (d1, d2, S) — the
    batch spans the 128 TPU lanes, matrix entries span sublanes, so each
    vector op processes one (d1, d2) plane for 128 stages at once;
  * all indexing is STATIC (python loops over the small dims unroll into
    fused multiply-adds; matmuls are k-loops of broadcast-FMA planes);
  * the contact-space KKT inverse is an unrolled Gauss-Jordan sweep
    without pivoting (valid for the symmetric quasi-definite
    [[M, J^T], [J, -D]] block — same math as ops/linalg.py
    gauss_jordan_inverse, reference robot.hpp:658 computeMJtJinv);
  * kernel 2 forms the condensed quadratic (reference
    contact_dynamics.cpp:109-140 condenseContactDynamics) and the LQR
    blocks in one pass.

Both the intermediate and the impact stage condense through the SAME
kernels: the stage type only changes the T_w columns, the A-row scale
(sA = dt vs 1) and which cost blocks are zero (ocp/impact_stage.py), all
of which are runtime inputs.

The public entry `condense_stage_batch` is a `jax.custom_batching
.custom_vmap`: called per-scenario it sees S = N stages; under the fleet
vmap the batching rule FLATTENS (B, N) -> (B*N,) so the lane dimension is
fully utilized instead of padding each scenario's 21 stages to 128.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128

# input name -> trailing (per-stage) rank, used by padding/layout helpers
_IN_SPECS = (
    ("M", 2), ("J", 2), ("inactive", 1), ("Tw1", 2), ("Tw2", 2),
    ("r1", 1), ("e2", 1),
    ("Wq", 2), ("Wv", 2), ("Wu", 2), ("Wa", 2), ("Wf", 2),
    ("Hq_d", 1), ("Hv_d", 1), ("Hu_d", 1), ("Ha_d", 1),
    ("dgdq", 2), ("dgdf", 2), ("d_cone", 1),
    ("gw", 1), ("gy", 1),
    ("Aqq", 2), ("Aqv", 2), ("xres_q", 1), ("Fv_res", 1),
    ("sA", 1), ("lam2", 1), ("lmdgmm", 1),
)
_IN_NAMES = tuple(n for n, _ in _IN_SPECS)
_OUT_NAMES = ("inv11", "inv12", "Sinv", "G", "c0", "A", "Bm", "xres",
              "Qxx", "Qxu", "Quu", "lx", "lu", "coneHqf", "Hff_c")


def _d0(A, i):
    """A[i] via slice+squeeze (integer indexing lowers to `gather`, which
    Mosaic only supports in 2D; slices always lower)."""
    return jnp.squeeze(jax.lax.slice_in_dim(A, i, i + 1, axis=0), axis=0)


def _d1(A, i):
    """A[:, i] via slice+squeeze."""
    return jnp.squeeze(jax.lax.slice_in_dim(A, i, i + 1, axis=1), axis=1)


def _matvec(Mat, vec):
    """(d1, d2, T) x (d2, T) -> (d1, T): one broadcast-FMA plane."""
    return jnp.sum(Mat * vec[None, :, :], axis=1)


def _matTvec(Mat, vec):
    """(d1, d2, T)^T x (d1, T) -> (d2, T)."""
    return jnp.sum(Mat * vec[:, None, :], axis=0)


def _matmul(A, B):
    """(m, k, T) @ (k, n, T) -> (m, n, T): static k-loop of plane FMAs."""
    k = A.shape[1]
    acc = _d1(A, 0)[:, None, :] * _d0(B, 0)[None, :, :]
    for i in range(1, k):
        acc = acc + _d1(A, i)[:, None, :] * _d0(B, i)[None, :, :]
    return acc


def _matTmul(A, B):
    """(k, m, T)^T @ (k, n, T) -> (m, n, T)."""
    k = A.shape[0]
    acc = _d0(A, 0)[:, None, :] * _d0(B, 0)[None, :, :]
    for i in range(1, k):
        acc = acc + _d0(A, i)[:, None, :] * _d0(B, i)[None, :, :]
    return acc


def _cat_nonempty(parts, axis):
    """Concat skipping zero-size pieces (Mosaic rejects 0-sized vectors)."""
    parts = [p for p in parts if p.shape[axis] > 0]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis)


def _set_row(A, k, row):
    return _cat_nonempty([A[:k], row[None], A[k + 1:]], 0)


def _set_col(A, k, col):
    return _cat_nonempty([A[:, :k], col[:, None], A[:, k + 1:]], 1)


def _set_entry(vec, k, val):
    return _cat_nonempty([vec[:k], val[None], vec[k + 1:]], 0)


def _gauss_jordan(A, n):
    """Unrolled in-place Gauss-Jordan inverse of (n, n, T) without
    pivoting (ops/linalg.py gauss_jordan_inverse, batch-last layout).
    Row/col/pivot restoration is concat-based static assembly (Pallas
    kernels cannot capture array constants; no scatters needed)."""
    for k in range(n):
        row0 = _d0(A, k)                   # (n, T)
        p = _d0(row0, k)                   # (T,)
        rinv = 1.0 / p
        row = row0 * rinv[None, :]         # (n, T)
        col = _d1(A, k)                    # (n, T)
        # rank-1 sweep zeroes row k and col k (col[k] = p)
        A = A - col[:, None, :] * row[None, :, :]
        # restore: row k <- row (pivot 1/p), col k <- -col/p (pivot 1/p)
        A = _set_row(A, k, _set_entry(row, k, rinv))
        A = _set_col(A, k, _set_entry(-col * rinv[None, :], k, rinv))
    return A


def _eye_planes(n, T, dt):
    """(n, n, 1) identity built from iota (constant-capture-free)."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (ri == ci).astype(dt)[:, :, None]


def _k1_kernel(nv, nf, M_ref, J_ref, inact_ref, Tw1_ref, Tw2_ref,
               r1_ref, e2_ref,
               inv11_ref, inv12_ref, Sinv_ref, G_ref, c0_ref):
    """Contact-space KKT inverse + T_w / rhs solves -> (Psi blocks, G, c0).
    Solves [[M, J^T], [J, -D]] X = [Tw1; Tw2] and the rhs column."""
    ny = nv + nf
    dt = M_ref.dtype
    M = M_ref[...]
    J = J_ref[...]
    inact = inact_ref[...]                               # (nf, T)
    eye_f = _eye_planes(nf, 1, dt)
    top = jnp.concatenate([M, jnp.swapaxes(J, 0, 1)], axis=1)
    bot = jnp.concatenate([J, -eye_f * inact[None, :, :]], axis=1)
    Psi = _gauss_jordan(jnp.concatenate([top, bot], axis=0), ny)
    i11 = Psi[:nv, :nv]
    i12 = 0.5 * (Psi[:nv, nv:] + jnp.swapaxes(Psi[nv:, :nv], 0, 1))
    Sv = -Psi[nv:, nv:]
    inv11_ref[...] = 0.5 * (i11 + jnp.swapaxes(i11, 0, 1))
    inv12_ref[...] = i12
    Sinv_ref[...] = 0.5 * (Sv + jnp.swapaxes(Sv, 0, 1))
    Tw = jnp.concatenate([Tw1_ref[...], Tw2_ref[...]], axis=0)
    X = _matmul(Psi, Tw)                                 # (ny, w, T)
    G_ref[...] = jnp.concatenate([-X[:nv], X[nv:]], axis=0)
    e = jnp.concatenate([r1_ref[...], e2_ref[...]], axis=0)   # (ny, T)
    x0 = _matvec(Psi, e)
    c0_ref[...] = jnp.concatenate([-x0[:nv], x0[nv:]], axis=0)


def _kc_kernel(nv, nu, nf, ncone,
               dgdq_ref, dgdf_ref, d_cone_ref,
               coneHqq_ref, coneHqf_ref, coneHff_ref):
    """Cone Gauss-Newton blocks: sum_r d_r * (dg_r x dg_r). A separate
    tiny kernel so K2 never holds the (ncone, nv/nf, T) Jacobians."""
    dgq = dgdq_ref[...]                                  # (ncone, nv, T)
    dgf = dgdf_ref[...]
    dc = d_cone_ref[...]                                 # (ncone, T)

    def _cone_terms(r):
        dcr, gq_r, gf_r = _d0(dc, r), _d0(dgq, r), _d0(dgf, r)
        dqr = dcr * gq_r
        return (dqr[:, None, :] * gq_r[None, :, :],
                dqr[:, None, :] * gf_r[None, :, :],
                (dcr * gf_r)[:, None, :] * gf_r[None, :, :])

    coneHqq, coneHqf, coneHff = _cone_terms(0)
    for r in range(1, ncone):
        tqq, tqf, tff = _cone_terms(r)
        coneHqq = coneHqq + tqq
        coneHqf = coneHqf + tqf
        coneHff = coneHff + tff
    coneHqq_ref[...] = coneHqq
    coneHqf_ref[...] = coneHqf
    coneHff_ref[...] = coneHff


def _k2_kernel(nv, nu, nf, ncone,
               G_ref, c0_ref, Hq_ref, Hv_ref, Hu_ref, Ha_ref, Hf_ref,
               coneHqf_ref, gw_ref, gy_ref,
               Qxx_ref, Qxu_ref, Quu_ref, gtil_ref):
    """Condensed quadratic over w = (dq, dv, du)
    (reference contact_dynamics.cpp:109-140). Takes the PRE-ASSEMBLED
    cost+constraint blocks (Wq + diag + cone terms, folded in XLA where
    the adds fuse for free); the LQR A/B/residual/gradient assembly lives
    in _k3_kernel — the three-way split keeps each kernel's
    double-buffered IO under the 16 MB VMEM budget."""
    w = 2 * nv + nu
    nx = 2 * nv
    ny = nv + nf
    dt = G_ref.dtype
    G = G_ref[...]
    c0 = c0_ref[...]
    Hq_blk = Hq_ref[...]
    Hv_blk = Hv_ref[...]
    Hu_blk = Hu_ref[...]
    Ha_blk = Ha_ref[...]
    Hf_blk = Hf_ref[...]
    coneHqf = coneHqf_ref[...]
    Ga, Gf = G[:nv], G[nv:]
    T = G.shape[-1]
    # Hy @ G with the block-diagonal Hy = diag(Ha_blk, Hf_blk)
    HyG = jnp.concatenate([_matmul(Ha_blk, Ga), _matmul(Hf_blk, Gf)],
                          axis=0)                        # (ny, w, T)
    CwyG = _matmul(coneHqf, Gf)                          # (nv, w, T)
    # Htil = blockdiag(Hq, Hv, Hu) + pad(CwyG) + pad(CwyG)^T + G^T Hy G,
    # assembled PER OUTPUT BLOCK — materializing the full (w, w, T)
    # temporaries (Hw/Cfull/Htil) blows the 16 MB VMEM budget.
    Gx, Gu2 = G[:, :nx], G[:, nx:]                       # (ny, nx/nu, T)
    HyGx, HyGu = HyG[:, :nx], HyG[:, nx:]
    Cx, Cu = CwyG[:, :nx], CwyG[:, nx:]                  # (nv, ., T)
    zxv = jnp.zeros((nx - nv, nx, T), dt)
    Cxp = jnp.concatenate([Cx, zxv], axis=0)             # (nx, nx, T)
    z_vu = jnp.zeros((nv, nu, T), dt)
    Qxx = _matTmul(Gx, HyGx) + Cxp + jnp.swapaxes(Cxp, 0, 1)
    Qxx = Qxx + jnp.concatenate([
        jnp.concatenate([Hq_blk, jnp.zeros((nv, nv, T), dt)], axis=1),
        jnp.concatenate([jnp.zeros((nv, nv, T), dt), Hv_blk], axis=1)],
        axis=0)
    Qxx_ref[...] = Qxx
    Qxu_ref[...] = (_matTmul(Gx, HyGu)
                    + jnp.concatenate([Cu, z_vu], axis=0))
    Quu_ref[...] = _matTmul(Gu2, HyGu) + Hu_blk
    # gtil = gw + Cwy c0 + G^T (Hy c0 + gy)
    c0a, c0f = c0[:nv], c0[nv:]
    hy0 = jnp.concatenate([_matvec(Ha_blk, c0a), _matvec(Hf_blk, c0f)],
                          axis=0) + gy_ref[...]
    Cc0 = jnp.concatenate(
        [_matvec(coneHqf, c0f), jnp.zeros((nv + nu, T), dt)], axis=0)
    gtil_ref[...] = gw_ref[...] + Cc0 + _matTvec(G, hy0)


def _k3_kernel(nv, nu, nf,
               G_ref, c0_ref, gtil_ref, Aqq_ref, Aqv_ref,
               xres_q_ref, Fv_res_ref, sA_ref, lam2_ref, lmdgmm_ref,
               A_ref, Bm_ref, xres_ref, lx_ref, lu_ref):
    """LQR block assembly: A/B from the condensed acceleration rows,
    state residual, and the costate-corrected gradients."""
    nx = 2 * nv
    dt = G_ref.dtype
    G = G_ref[...]
    c0 = c0_ref[...]
    gtil = gtil_ref[...]
    c0a = c0[:nv]
    Ga = G[:nv]
    T = G.shape[-1]
    eye_v = _eye_planes(nv, 1, dt)
    sA = sA_ref[...]                                     # (1, T)
    Gq, Gv, Gu = Ga[:, :nv], Ga[:, nv:2 * nv], Ga[:, 2 * nv:]
    A_top = jnp.concatenate([Aqq_ref[...], Aqv_ref[...]], axis=1)
    A_bot = jnp.concatenate(
        [sA[None, :, :] * Gq,
         jnp.broadcast_to(eye_v, (nv, nv, T)) + sA[None, :, :] * Gv],
        axis=1)
    A = jnp.concatenate([A_top, A_bot], axis=0)          # (nx, nx, T)
    A_ref[...] = A
    Bm = jnp.concatenate(
        [jnp.zeros((nv, nu, T), dt), sA[None, :, :] * Gu], axis=0)
    Bm_ref[...] = Bm
    xres_ref[...] = jnp.concatenate(
        [xres_q_ref[...], Fv_res_ref[...] + sA * c0a], axis=0)
    lam2 = lam2_ref[...]                                 # (nx, T)
    lx_ref[...] = gtil[:nx] + _matTvec(A, lam2) - lmdgmm_ref[...]
    lu_ref[...] = gtil[nx:] + _matTvec(Bm, lam2)


def _block_spec(shape_head, tile):
    """BlockSpec for a batch-last array (d1[, d2], S): full head dims, one
    S-tile per grid step."""
    nd = len(shape_head)
    return pl.BlockSpec(shape_head + (tile,),
                        (lambda i: (0,) * nd + (i,)),
                        memory_space=pltpu.VMEM)


def _condense_flat(dims, interpret, **arrs):
    """Primal (unbatched) implementation over batch-FIRST (S, ...) arrays."""
    nv, nu, nf, ncone = dims
    ny, w, nx = nv + nf, 2 * nv + nu, 2 * nv
    S = arrs["M"].shape[0]
    S_pad = -(-S // TILE) * TILE
    dt = arrs["M"].dtype

    def to_lanes(x, pad_eye=False):
        if x.shape[0] != S_pad:
            padw = [(0, S_pad - S)] + [(0, 0)] * (x.ndim - 1)
            x = jnp.pad(x, padw)
            if pad_eye:  # keep the padded KKT blocks nonsingular
                n = x.shape[-1]
                pad_block = jnp.broadcast_to(jnp.eye(n, dtype=dt),
                                             (S_pad - S, n, n))
                x = x.at[S:].set(pad_block)
        if x.ndim == 1:
            x = x[:, None]
        return jnp.moveaxis(x, 0, -1)

    ins = {}
    for name, rank in _IN_SPECS:
        a = arrs[name]
        ins[name] = to_lanes(a, pad_eye=(name == "M"))
        if name == "inactive" and S_pad != S:
            ins[name] = ins[name].at[:, S:].set(1.0)
    grid = (S_pad // TILE,)

    k1_in = ["M", "J", "inactive", "Tw1", "Tw2", "r1", "e2"]
    k1_shapes = [(nv, nv), (nv, nf), (nf,), (nf, nf), (ny, w), (ny,)]
    out1_shapes = {"inv11": (nv, nv), "inv12": (nv, nf), "Sinv": (nf, nf),
                   "G": (ny, w), "c0": (ny,)}
    o1 = pl.pallas_call(
        functools.partial(_k1_kernel, nv, nf),
        grid=grid,
        in_specs=[_block_spec(ins[n].shape[:-1], TILE) for n in k1_in],
        out_specs=tuple(_block_spec(s if len(s) == 2 else (s[0],), TILE)
                        for s in out1_shapes.values()),
        out_shape=tuple(
            jax.ShapeDtypeStruct(
                (s if len(s) == 2 else (s[0],)) + (S_pad,), dt)
            for s in out1_shapes.values()),
        interpret=interpret,
    )(*[ins[n] for n in k1_in])
    o1 = dict(zip(out1_shapes, o1))

    kc_in = ["dgdq", "dgdf", "d_cone"]
    outc_shapes = {"coneHqq": (nv, nv), "coneHqf": (nv, nf),
                   "coneHff": (nf, nf)}
    oc = pl.pallas_call(
        functools.partial(_kc_kernel, nv, nu, nf, ncone),
        grid=grid,
        in_specs=[_block_spec(ins[n].shape[:-1], TILE) for n in kc_in],
        out_specs=tuple(_block_spec(s, TILE)
                        for s in outc_shapes.values()),
        out_shape=tuple(
            jax.ShapeDtypeStruct(s + (S_pad,), dt)
            for s in outc_shapes.values()),
        interpret=interpret,
    )(*[ins[n] for n in kc_in])
    oc = dict(zip(outc_shapes, oc))

    # cost + PDIPM + cone block assembly: batched-diagonal adds fuse in
    # XLA; keeping them out of K2 shrinks its VMEM-resident input set
    def _diag_planes(vec, n):
        # vec: (n, S_pad) -> (n, n, S_pad) with vec on the diagonal
        return jnp.eye(n, dtype=dt)[:, :, None] * vec[None, :, :]

    Hq_blk = ins["Wq"] + _diag_planes(ins["Hq_d"], nv) + oc["coneHqq"]
    Hv_blk = ins["Wv"] + _diag_planes(ins["Hv_d"], nv)
    Hu_blk = ins["Wu"] + _diag_planes(ins["Hu_d"], nu)
    Ha_blk = ins["Wa"] + _diag_planes(ins["Ha_d"], nv)
    Hf_blk = ins["Wf"] + oc["coneHff"]

    k2_args = [o1["G"], o1["c0"], Hq_blk, Hv_blk, Hu_blk, Ha_blk,
               Hf_blk, oc["coneHqf"], ins["gw"], ins["gy"]]
    out2_shapes = {"Qxx": (nx, nx), "Qxu": (nx, nu), "Quu": (nu, nu),
                   "gtil": (w,)}
    o2 = pl.pallas_call(
        functools.partial(_k2_kernel, nv, nu, nf, ncone),
        grid=grid,
        in_specs=[_block_spec(a.shape[:-1], TILE) for a in k2_args],
        out_specs=tuple(_block_spec(s if len(s) == 2 else (s[0],), TILE)
                        for s in out2_shapes.values()),
        out_shape=tuple(
            jax.ShapeDtypeStruct(
                (s if len(s) == 2 else (s[0],)) + (S_pad,), dt)
            for s in out2_shapes.values()),
        interpret=interpret,
    )(*k2_args)
    o2 = dict(zip(out2_shapes, o2))
    o2["coneHqf"] = oc["coneHqf"]
    o2["Hff_c"] = Hf_blk

    k3_in = ["G", "c0", "gtil", "Aqq", "Aqv", "xres_q", "Fv_res", "sA",
             "lam2", "lmdgmm"]
    k3_args = [o1[n] if n in o1 else (o2[n] if n in o2 else ins[n])
               for n in k3_in]
    out3_shapes = {"A": (nx, nx), "Bm": (nx, nu), "xres": (nx,),
                   "lx": (nx,), "lu": (nu,)}
    o3 = pl.pallas_call(
        functools.partial(_k3_kernel, nv, nu, nf),
        grid=grid,
        in_specs=[_block_spec(a.shape[:-1], TILE) for a in k3_args],
        out_specs=tuple(_block_spec(s if len(s) == 2 else (s[0],), TILE)
                        for s in out3_shapes.values()),
        out_shape=tuple(
            jax.ShapeDtypeStruct(
                (s if len(s) == 2 else (s[0],)) + (S_pad,), dt)
            for s in out3_shapes.values()),
        interpret=interpret,
    )(*k3_args)
    o2.update(dict(zip(out3_shapes, o3)))

    out = {}
    for name in _OUT_NAMES:
        src = o1 if name in o1 else o2
        out[name] = jnp.moveaxis(src[name], -1, 0)[:S]
    return tuple(out[n] for n in _OUT_NAMES)


def make_condense(nv, nu, nf, ncone, interpret=False):
    """Build the custom-vmap condense entry for fixed static dims.

    Returns fn(**arrays) -> dict, where every array is batch-first
    (S, ...). Under an outer vmap (the MPC scenario fleet) the batching
    rule flattens (B, S) -> (B*S,) so lanes stay full."""
    if nf <= 0 or ncone <= 0:
        raise ValueError(
            f"Pallas condense kernel needs nf > 0 and ncone > 0 (got "
            f"nf={nf}, ncone={ncone}): zero-size blocks are not "
            f"lowerable. Use stage.condense_jax (use_pallas=False) for "
            f"contact-free problems.")
    dims = (nv, nu, nf, ncone)

    @jax.custom_batching.custom_vmap
    def call(*args):
        return _condense_flat(dims, interpret,
                              **dict(zip(_IN_NAMES, args)))

    @call.def_vmap
    def _rule(axis_size, in_batched, *args):
        flat = []
        for a, b in zip(args, in_batched):
            if b:
                flat.append(a.reshape((axis_size * a.shape[1],)
                                      + a.shape[2:]))
            else:
                bc = jnp.broadcast_to(a, (axis_size,) + a.shape)
                flat.append(bc.reshape((axis_size * a.shape[0],)
                                       + a.shape[1:]))
        outs = call(*flat)
        outs = tuple(o.reshape((axis_size, -1) + o.shape[1:]) for o in outs)
        return outs, tuple(True for _ in outs)

    def fn(**arrays):
        out = call(*[arrays[n] for n in _IN_NAMES])
        return dict(zip(_OUT_NAMES, out))

    return fn


@functools.lru_cache(maxsize=None)
def _cached_condense(nv, nu, nf, ncone, interpret):
    return make_condense(nv, nu, nf, ncone, interpret=interpret)


def get_condense(nv, nu, nf, ncone):
    """Condense entry for the solver: compiled Mosaic kernels on TPU,
    interpreter mode on CPU (the pure-JAX condense_jax path is the
    default on CPU; interpret here only serves equivalence tests)."""
    interpret = jax.default_backend() == "cpu"
    return _cached_condense(nv, nu, nf, ncone, interpret)
