"""iCub walk MPC update rate on the real TPU (round-4 verdict item #2:
the humanoid hot path must ride the Pallas kernels and have a measured
number). Reference config: examples/icub/mpc/walk.py:28-41 (T=0.7, N=25,
surface contacts + contact wrench cones).

The fleet iterate is warmed the way the MPC layer actually runs: init
to convergence at standing double support, then MPC updates to mid-gait
(single-support, one foot mid-swing) — a cold standing iterate does not
converge on the mid-gait humanoid problem (the single-sole wrench cone
is statically infeasible for the between-feet CoM, so full Newton steps
from far away cycle; the closed-loop warm start is the product path).

Usage: python tools/bench_icub_walk.py [--batch 128] [--reps 10]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--batch", type=int, default=128)
parser.add_argument("--reps", type=int, default=10)
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--t-target", type=float, default=0.62,
                    help="mid-gait time at which the fleet is benched")
parser.add_argument("--ls", action="store_true",
                    help="globalized updates (KKT backtracking) in the "
                         "timed step — in f32 the raw 2-it Newton cadence "
                         "does not contract on the mid-swing humanoid "
                         "problem (measured round-5); this is the "
                         "recommended humanoid MPC configuration")
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


def main():
    from robotoc_tpu.models import (forward_kinematics, frame_placement,
                                    load_robot)
    from robotoc_tpu.models import robot as rm
    from robotoc_tpu.mpc.gait_mpc import MPCBipedWalk
    from robotoc_tpu.solver import ocp_solver as OS
    from robotoc_tpu.ops import pallas_chain as pch

    dtype = jnp.float32
    m = load_robot("icub_lower_half", dtype=dtype)
    T, N = 0.7, 25
    mpc = MPCBipedWalk(m, T=T, N=N)
    mpc.set_wrench_cone_rectangular(X=0.05, Y=0.025)
    planner = mpc.make_planner()
    planner.set_gait_pattern(np.array([0.22, 0, 0]), 0.0)
    mpc.set_gait_pattern(planner, swing_height=0.1, swing_time=0.7,
                         stance_time=0.0, swing_start_time=0.5)
    knee = np.pi / 6
    q0 = np.array([0, 0, 0, 0, 0, 0, 1,
                   0.5 * knee, 0, 0, -knee, 0.5 * knee, 0,
                   0.5 * knee, 0, 0, -knee, 0.5 * knee, 0])
    Rw, pw = forward_kinematics(m, jnp.asarray(q0, dtype))
    zs = [np.asarray(frame_placement(m, m.frame_id(f), Rw, pw)[1])[2]
          for f in ["l_sole", "r_sole"]]
    q0[2] = -0.5 * (zs[0] + zs[1])
    q0 = jnp.asarray(q0, dtype)
    v0 = jnp.zeros(m.nv, dtype)
    print("chain_supported:", pch.chain_supported(m, mpc.contacts),
          flush=True)

    # --- warm the iterate the way the product runs -------------------
    t0 = time.perf_counter()
    kkt0 = mpc.init(0.0, q0, v0, num_iters=40)
    print(f"init kkt {kkt0:.3e} ({time.perf_counter() - t0:.1f}s)",
          flush=True)
    control_dt = 0.005
    t, q, v = 0.0, q0, v0
    t0 = time.perf_counter()
    while t < args.t_target - 1e-9:
        kkt = mpc.update_solution(t, control_dt, q, v, max_iter=2)
        q = rm.integrate(m, q, control_dt * mpc.sol.v[0])
        v = mpc.sol.v[0] + control_dt * mpc.sol.a[0]
        t += control_dt
    print(f"warmed to t={t:.2f}, kkt {kkt:.3e} "
          f"({time.perf_counter() - t0:.1f}s)", flush=True)

    grid, costs = mpc.grid, mpc._costs
    sol_w = mpc.sol
    solver = mpc._solver
    on_tpu = jax.default_backend() not in ("cpu",)

    ls = "kkt" if args.ls else False

    def mpc_update(sol, qq, vv):
        def it(s, _):
            s, kkt, _, _ = OS._update(
                m, mpc.contacts, mpc.limits, 1e-3, 0.995, mpc.n_reserved,
                costs, s, grid, qq, vv, enable_sw=True, enable_ls=ls,
                use_pallas=on_tpu, use_chain=on_tpu)
            return s, kkt

        sol, kkts = jax.lax.scan(it, sol, None, length=2)
        return sol, kkts[-1]

    for B in (1, args.batch):
        sols = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape),
                            sol_w)
        dq = 0.0075 * jax.random.normal(jax.random.PRNGKey(0), (B, m.nv),
                                      dtype)
        q0s = jax.vmap(lambda d: rm.integrate(m, q, d))(dq)
        v0s = jnp.broadcast_to(v, (B, m.nv)).astype(dtype)
        step = jax.jit(jax.vmap(mpc_update))
        t0 = time.perf_counter()
        sols_w, kkt = step(sols, q0s, v0s)
        for _ in range(12):  # settle the perturbed fleet
            sols_w, kkt = step(sols_w, q0s, v0s)
        jax.block_until_ready(kkt)
        print(f"B={B}: compile+settle {time.perf_counter() - t0:.1f}s, "
              f"fleet max kkt {float(jnp.max(kkt)):.3e}", flush=True)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            sols_w, kkt = step(sols_w, q0s, v0s)
        jax.block_until_ready(kkt)
        dt_s = (time.perf_counter() - t0) / args.reps
        print(f"B={B}: {dt_s * 1e3:.2f} ms/fleet-step = "
              f"{B / dt_s:.1f} updates/s, fleet max kkt "
              f"{float(jnp.max(kkt)):.3e}", flush=True)


if __name__ == "__main__":
    main()
