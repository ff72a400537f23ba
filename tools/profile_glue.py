"""Fine-grained timing of the XLA glue around the Pallas kernels in the
flagship build (round-5 perf push: the round-4 profile shows ~10 ms of
non-kernel XLA in the 19 ms Newton iteration).

Usage: python tools/profile_glue.py [--batch 128] [--reps 20]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--batch", type=int, default=128)
parser.add_argument("--reps", type=int, default=20)
parser.add_argument("--cpu", action="store_true")
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
os.makedirs(os.path.expanduser("~/.cache/robotoc_tpu_xla"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/robotoc_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np


def timed(name, fn, *xs):
    t0 = time.perf_counter()
    out = fn(*xs)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(args.reps):
        out = fn(*xs)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / args.reps * 1e3
    print(f"{name:44s} {ms:9.2f} ms   (compile+1st {compile_s:.1f}s)",
          flush=True)
    return ms


def main():
    from robotoc_tpu.models import load_robot
    from robotoc_tpu.mpc.mpc_trot import MPCTrot
    from robotoc_tpu.solver import ocp_solver as OS
    from robotoc_tpu.ocp import contact_stage as stage
    from robotoc_tpu.models import robot as rm
    from robotoc_tpu.costs import base as cost_base
    from robotoc_tpu.constraints import joint_limits as jl
    from robotoc_tpu.ops import pallas_chain as pchain

    dtype = jnp.float32
    m = load_robot("anymal", dtype=dtype)
    T, N = 0.5, 20
    mpc = MPCTrot(m, T=T, N=N)
    planner = mpc.make_planner()
    planner.set_gait_pattern(np.array([0.15, 0, 0]), 0.0)
    mpc.set_gait_pattern(planner, swing_height=0.1, swing_time=0.25,
                         stance_time=0.0, swing_start_time=0.5)
    q0 = jnp.asarray([0, 0, 0.4792, 0, 0, 0, 1, -0.1, 0.7, -1.0,
                      -0.1, -0.7, 1.0, 0.1, 0.7, -1.0, 0.1, -0.7, 1.0],
                     dtype)
    v0 = jnp.zeros(18, dtype)
    mpc.planner.init(q0)
    mpc.config_cost = mpc.config_cost.replace(q_ref=q0)
    grid, costs = mpc._build_schedule_and_costs(0.35, q0, v0)
    solver = OS.OCPSolver(m, mpc.contacts, costs, mpc.limits, T=T, N=N,
                          n_reserved_events=mpc.n_reserved)
    sol0 = solver.init_solution(grid, q0, v0)
    B = args.batch
    contacts = mpc.contacts
    limits = mpc.limits
    barrier = 1e-3
    S = grid.n_slots - 1
    nf = contacts.max_dimf

    flat = lambda x: jnp.reshape(
        jnp.broadcast_to(x, (B,) + x.shape),
        (B * x.shape[0],) + x.shape[1:])
    qs = flat(sol0.q[:-1]); vs = flat(sol0.v[:-1]); as_ = flat(sol0.a[:-1])
    us = flat(sol0.u[:-1]); fs = flat(sol0.f[:-1])
    dts = flat(grid.dt); ts = flat(grid.t[:-1])
    cmask = flat(grid.contact_mask[:-1]); p_ref = flat(grid.p_ref[:-1])
    fric = flat(grid.friction[:-1]); R_ref = flat(grid.R_ref[:-1])
    s_lim = flat(sol0.s_lim); z_lim = flat(sol0.z_lim)
    s_cone = flat(sol0.s_cone); z_cone = flat(sol0.z_cone)
    betas = flat(sol0.beta[:-1]); mus = flat(sol0.mu[:-1])
    lmds = flat(sol0.lmd[:-1]); gmms = flat(sol0.gmm[:-1])
    lmdns = flat(sol0.lmd[1:]); gmmns = flat(sol0.gmm[1:])
    qns = flat(sol0.q[1:]); vns = flat(sol0.v[1:])
    barr = jnp.full_like(dts, barrier)

    # chain outputs, precomputed once (not in the timed region)
    chain = pchain.get_chain(m, contacts)
    rowm = jax.vmap(contacts.force_mask)(cmask)
    co = jax.jit(chain)(qs, vs, as_, fs * rowm, fric, p_ref, R_ref)
    co = jax.tree.map(lambda x: jax.block_until_ready(x), co)

    # 1. full stage_pre GLUE (chain outputs given)
    pre_fn = functools.partial(stage.stage_pre, m, contacts, costs,
                               limits)

    def glue(co_, t, dt, b, q, v, a, u, f, beta, mu, lmd, gmm, lmdn,
             gmmn, qn, vn, sl, zl, sc, zc, cm, pr, fr, Rr):
        out = pre_fn(t, dt, b, q, v, a, u, f, beta, mu, lmd, gmm, lmdn,
                     gmmn, qn, vn, sl, zl, sc, zc, cm, pr, fr, Rr,
                     chain_out=co_)
        return out["gw"], out["Wq"], out["aux_kkt_sq"]

    timed("stage_pre glue (chain_out given, B*N)",
          jax.jit(jax.vmap(glue)),
          co, ts, dts, barr, qs, vs, as_, us, fs, betas, mus, lmds,
          gmms, lmdns, gmmns, qns, vns, s_lim, z_lim, s_cone, z_cone,
          cmask, p_ref, fric, R_ref)

    # 2. cost quadratize with kin-fold (the pallas-path cost segment)
    kin_frames = cost_base.kin_fold_frames(costs)

    def quad_kin(co_, q, v, a, u, f, t, dt):
        kin = (kin_frames, co_["task"], co_["dtask"])
        out = cost_base.quadratize_stage(costs, m, nf, q, v, a, u, f,
                                         t, dt, kin=kin)
        return out.lq, out.Qqq

    timed("cost quadratize KIN-FOLD (B*N)", jax.jit(jax.vmap(quad_kin)),
          co, qs, vs, as_, us, fs, ts, dts)

    # 2b. config-cost part alone (Lie diff + J^T W J)
    cfg = costs[0]

    def quad_cfg(q, v, a, u, t, dt):
        out = cfg.quadratize_stage(m, nf, q, v, a, u,
                                   jnp.zeros((nf,), dtype), t, dt)
        return out.lq, out.Qqq

    timed("  config-cost quadratize (B*N)", jax.jit(jax.vmap(quad_cfg)),
          qs, vs, as_, us, ts, dts)

    # 2c. base-rot part alone
    br = costs[1]

    def quad_br(q, v, a, u, t, dt):
        out = br.quadratize_stage(m, nf, q, v, a, u,
                                  jnp.zeros((nf,), dtype), t, dt)
        return out.lq, out.Qqq

    timed("  base-rot quadratize (B*N)", jax.jit(jax.vmap(quad_br)),
          qs, vs, as_, us, ts, dts)

    # 2d. task (kin-fold) part alone
    task = costs[2]

    def quad_task(co_, q, v, a, u, f, t, dt):
        out = task.quadratize_stage_kin(m, nf, q, v, a, u, f, t, dt,
                                        co_["task"], co_["dtask"])
        return out.lq, out.Qqq

    timed("  task quadratize KIN (B*N)", jax.jit(jax.vmap(quad_task)),
          co, qs, vs, as_, us, fs, ts, dts)

    # 3. PDIPM condense (limits)
    def pdipm_part(q, v, a, u, sl, zl):
        e = jl.constraint_values(m, limits, q, v, u, a)
        return jl.condense(m, limits, e, sl, zl, barrier)[0]

    timed("  jl PDIPM condense (B*N)", jax.jit(jax.vmap(pdipm_part)),
          qs, vs, as_, us, s_lim, z_lim)


if __name__ == "__main__":
    main()
