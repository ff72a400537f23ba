"""Phase-split profiling of one MPC Newton update on the real TPU.

Times the jitted sub-phases of the flagship bench problem (ANYmal trot,
N=20, B scenarios) separately: fused stage derivatives, cost quadratize,
contact-space inverse (mjtj), full stage build, impact slots, Riccati,
expansion, and the full update. Drives the round-3 optimization order
(VERDICT round-2 item #1).

Usage: python tools/profile_phases.py [--batch 128] [--reps 10]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--batch", type=int, default=128)
parser.add_argument("--reps", type=int, default=10)
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--pallas", action="store_true",
                    help="profile the Pallas path phases (round-4)")
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


def timed(name, fn, *xs, reps=None):
    reps = reps or args.reps
    t0 = time.perf_counter()
    out = fn(*xs)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*xs)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:38s} {ms:9.2f} ms   (compile+1st {compile_s:.1f}s)",
          flush=True)
    return ms


def main():
    from robotoc_tpu.models import load_robot
    from robotoc_tpu.mpc.mpc_trot import MPCTrot
    from robotoc_tpu.solver import ocp_solver as OS
    from robotoc_tpu.ocp import contact_stage as stage
    from robotoc_tpu.models import contacts as ct
    from robotoc_tpu.models import robot as rm
    from robotoc_tpu.costs import base as cost_base
    from robotoc_tpu.dynamics.contact_dynamics import mjtj_inverse
    from robotoc_tpu.riccati import lqr

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
    sols = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), sol0)
    key = jax.random.PRNGKey(0)
    dq = 0.03 * jax.random.normal(key, (B, 18), dtype)
    q0s = jax.vmap(lambda d: rm.integrate(m, q0, d))(dq)
    v0s = jnp.zeros((B, 18), dtype)
    n_imp = mpc.n_reserved
    barrier = 1e-3

    # ---- full update ----------------------------------------------------
    def upd(sol, q0, v0):
        s, kkt, _, _ = OS._update(m, mpc.contacts, mpc.limits, barrier,
                                  0.995, n_imp, costs, sol, grid, q0, v0)
        return kkt

    timed("full update (1 Newton it)", jax.jit(jax.vmap(upd)),
          sols, q0s, v0s)

    # ---- build only ------------------------------------------------------
    def build(sol, q0, v0):
        data, blocks, dx0, kkt_sq, _, _ = OS._build(
            m, mpc.contacts, mpc.limits, barrier, n_imp, costs, sol, grid,
            q0, v0)
        return kkt_sq, data.Qxx, data.lx

    timed("build (stages+impacts+assembly)", jax.jit(jax.vmap(build)),
          sols, q0s, v0s)

    # ---- build pieces over all B*N stages --------------------------------
    S = grid.n_slots - 1
    flat = lambda x: jnp.reshape(
        jnp.broadcast_to(x, (B,) + x.shape), (B * x.shape[0],) + x.shape[1:])
    qs = flat(sol0.q[:-1]); vs = flat(sol0.v[:-1]); as_ = flat(sol0.a[:-1])
    us = flat(sol0.u[:-1]); fs = flat(sol0.f[:-1])
    dts = flat(grid.dt); ts = flat(grid.t[:-1])
    cmask = flat(grid.contact_mask[:-1]); p_ref = flat(grid.p_ref[:-1])
    fric = flat(grid.friction[:-1]); R_ref = flat(grid.R_ref[:-1])

    def deriv_chain(q, v, a, f, fr, pr, Rr, cm):
        rowmask = mpc.contacts.force_mask(cm)
        out = ct.fused_stage_derivatives(m, mpc.contacts, q, v, a,
                                         f * rowmask, fr, pr, Rr)
        return out[1][0], out[2][2], out[0][0]

    timed("fused_stage_derivatives (B*N)",
          jax.jit(jax.vmap(deriv_chain)),
          qs, vs, as_, fs, fric, p_ref, R_ref, cmask)

    def quad(q, v, a, u, f, t, dt):
        out = cost_base.quadratize_stage(costs, m, mpc.contacts.max_dimf,
                                         q, v, a, u, f, t, dt)
        return out.lq, out.Qqq

    timed("cost quadratize (B*N)", jax.jit(jax.vmap(quad)),
          qs, vs, as_, us, fs, ts, dts)

    def mjtj(q, v, a, f, fr, pr, Rr, cm):
        rowmask = mpc.contacts.force_mask(cm)
        (_, (dIDdq, dIDdv, M), (dCdq, dCdv, J), _) = \
            ct.fused_stage_derivatives(m, mpc.contacts, q, v, a,
                                       f * rowmask, fr, pr, Rr)
        J = J * rowmask[:, None]
        return mjtj_inverse(M, J, 1.0 - rowmask)

    t_deriv_plus_inv = timed("derivs + mjtj_inverse (B*N)",
                             jax.jit(jax.vmap(mjtj)),
                             qs, vs, as_, fs, fric, p_ref, R_ref, cmask)

    # mjtj on cached (M, J): measure the inverse alone
    Ms = jnp.broadcast_to(jnp.eye(18, dtype=dtype)[None], (B * S, 18, 18)) \
        + 0.01 * jax.random.normal(key, (B * S, 18, 18), dtype)
    Ms = 0.5 * (Ms + jnp.swapaxes(Ms, -1, -2)) \
        + 18 * jnp.eye(18, dtype=dtype)[None]
    Js = jax.random.normal(key, (B * S, 12, 18), dtype)
    inact = jnp.zeros((B * S, 12), dtype)
    timed("mjtj_inverse alone (B*N)",
          jax.jit(jax.vmap(mjtj_inverse)), Ms, Js, inact)

    # ---- riccati + expand -------------------------------------------------
    built = jax.jit(jax.vmap(build))  # warm
    def full_build(sol, q0, v0):
        return OS._build(m, mpc.contacts, mpc.limits, barrier, n_imp,
                         costs, sol, grid, q0, v0)

    built_all = jax.jit(jax.vmap(full_build))(sols, q0s, v0s)
    jax.block_until_ready(built_all[3])
    data = built_all[0]

    timed("riccati serial scan (B)",
          jax.jit(jax.vmap(lqr.solve)), data,
          built_all[2])

    def expand_only(sol, built_data, built_blocks, dx0):
        dx, du, dlmd_all, policy = lqr.solve(built_data, dx0)
        d = OS._expand_directions(m, mpc.contacts, mpc.limits, barrier,
                                  n_imp, built_blocks, sol, grid, dx, du,
                                  dlmd_all)
        return d.da, d.df

    timed("riccati+expand (B)",
          jax.jit(jax.vmap(functools.partial(expand_only))),
          sols, built_all[0], built_all[1], built_all[2])

    if args.pallas:
        from robotoc_tpu.ops import pallas_chain as pchain
        from robotoc_tpu.riccati import pallas_scan as plscan

        print("---- Pallas path (round-4) ----", flush=True)

        def upd_p(sol, q0, v0):
            s_, kkt, _, _ = OS._update(
                m, mpc.contacts, mpc.limits, barrier, 0.995, n_imp,
                costs, sol, grid, q0, v0, enable_sw=True,
                use_pallas=True, use_chain=True)
            return kkt

        timed("full update PALLAS (sw, 1 it)", jax.jit(jax.vmap(upd_p)),
              sols, q0s, v0s)

        def build_p(sol, q0, v0):
            data, blocks, dx0, kkt_sq, _, _ = OS._build(
                m, mpc.contacts, mpc.limits, barrier, n_imp, costs, sol,
                grid, q0, v0, enable_sw=True, use_pallas=True,
                use_chain=True)
            return kkt_sq, data.lx, dx0

        timed("build PALLAS (chain+condense+sw)",
              jax.jit(jax.vmap(build_p)), sols, q0s, v0s)

        chain = pchain.get_chain(m, mpc.contacts)
        rowm = jax.vmap(mpc.contacts.force_mask)(cmask)
        timed("pallas chain kernel (B*N)", jax.jit(chain),
              qs, vs, as_, fs * rowm, fric,
              jnp.reshape(p_ref, (B * S,) + p_ref.shape[1:]))

        def build_sw(sol, q0, v0):
            return OS._build(m, mpc.contacts, mpc.limits, barrier, n_imp,
                             costs, sol, grid, q0, v0, enable_sw=True,
                             use_pallas=True, use_chain=True)

        built_p = jax.jit(jax.vmap(build_sw))(sols, q0s, v0s)
        jax.block_until_ready(built_p[3])
        timed("pallas riccati sweep (B)",
              jax.jit(jax.vmap(plscan.solve)), built_p[0], built_p[2])

        def dirstep(sol, built, q0, v0):
            # expansion + step sizes + integrate, riccati included
            out = OS._direction_and_step(
                m, mpc.contacts, mpc.limits, barrier, 0.995, n_imp,
                costs, sol, grid, q0, v0, built, riccati=plscan,
                enable_sw=True)
            return out[1]

        timed("riccati+expand+integrate (B)",
              jax.jit(jax.vmap(dirstep)),
              sols, built_p, q0s, v0s)

        # stage_pre (XLA glue: cost quadratize + PDIPM vectors + state
        # eq + residuals) with the chain outputs precomputed, and the
        # condense kernel alone on the pre outputs
        import functools as _ft
        from robotoc_tpu.ocp import contact_stage as _cs
        from robotoc_tpu.ops import pallas_condense as _pc

        chain_fn = pchain.get_chain(m, mpc.contacts)

        def pre_all(sol, q0, v0):
            dtg = grid.dt
            pre_args = (grid.t[:-1], dtg, jnp.full_like(dtg, barrier),
                        sol.q[:-1], sol.v[:-1], sol.a[:-1], sol.u[:-1],
                        sol.f[:-1], sol.beta[:-1], sol.mu[:-1],
                        sol.lmd[:-1], sol.gmm[:-1], sol.lmd[1:],
                        sol.gmm[1:], sol.q[1:], sol.v[1:], sol.s_lim,
                        sol.z_lim, sol.s_cone, sol.z_cone,
                        grid.contact_mask[:-1], grid.p_ref[:-1],
                        grid.friction[:-1], grid.R_ref[:-1])
            rowmask = jax.vmap(mpc.contacts.force_mask)(
                grid.contact_mask[:-1])
            co = chain_fn(sol.q[:-1], sol.v[:-1], sol.a[:-1],
                          sol.f[:-1] * rowmask, grid.friction[:-1],
                          grid.p_ref[:-1])
            pre_fn = _ft.partial(_cs.stage_pre, m, mpc.contacts, costs,
                                 mpc.limits)
            return jax.vmap(lambda c, *a: pre_fn(*a, chain_out=c))(
                co, *pre_args)

        pre_out = jax.jit(jax.vmap(pre_all))(sols, q0s, v0s)
        jax.block_until_ready(pre_out["gw"])
        timed("stage_pre XLA glue (incl chain)",
              jax.jit(jax.vmap(pre_all)), sols, q0s, v0s)

        kin_names = [k for k in pre_out if not k.startswith("aux_")]
        kin = {k: pre_out[k] for k in kin_names}
        cond = _pc.get_condense(m.nv, m.dimu, mpc.contacts.max_dimf,
                                mpc.contacts.dimc_cone)
        timed("pallas condense kernel (B)",
              jax.jit(jax.vmap(lambda kk: cond(**kk))), kin)


if __name__ == "__main__":
    main()
