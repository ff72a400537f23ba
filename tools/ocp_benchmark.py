"""ANYmal OCP benchmark — parity with the reference harness.

Mirrors reference examples/anymal/ocp_benchmark.cpp:108-132: ANYmal,
4 point contacts, standing, T=0.5 s, N=20, timed `update_solution`
iterations, prints total + per-update ms. The reference runs 10,000
updates on 4 CPU threads; here the same problem runs B=1 (latency
parity) and scenario-batched (the TPU throughput axis the reference
does not have).

Usage: python tools/ocp_benchmark.py [--reps 1000] [--batch 128] [--cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--reps", type=int, default=1000)
parser.add_argument("--batch", type=int, default=128)
parser.add_argument("--cpu", action="store_true")
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
os.makedirs(os.path.expanduser("~/.cache/robotoc_tpu_xla"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/robotoc_tpu_xla"))
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np


def main():
    from robotoc_tpu.constraints.joint_limits import make_joint_limits
    from robotoc_tpu.costs.config_cost import make_config_cost
    from robotoc_tpu.models import (forward_kinematics, frame_placement,
                                    load_robot)
    from robotoc_tpu.models.contacts import make_contacts
    from robotoc_tpu.planner.contact_sequence import (ContactSchedule,
                                                      discretize)
    from robotoc_tpu.solver import ocp_solver as OS

    dtype = jnp.float32
    m = load_robot("anymal", dtype=dtype)
    feet = ["LF_FOOT", "LH_FOOT", "RF_FOOT", "RH_FOOT"]
    contacts = make_contacts(m, feet, baumgarte_time_step=0.04)
    # reference ocp_benchmark.cpp weights (standing, all contacts active)
    q0 = jnp.asarray([0, 0, 0.4792, 0, 0, 0, 1, -0.1, 0.7, -1.0,
                      -0.1, -0.7, 1.0, 0.1, 0.7, -1.0, 0.1, -0.7, 1.0],
                     dtype)
    qw = jnp.asarray([0, 0, 0, 250000, 250000, 250000] + [0.0001] * 12,
                     dtype)
    vw = jnp.asarray([100.0] * 6 + [1.0] * 12, dtype)
    cost = make_config_cost(m, q_ref=q0, q_weight=qw, v_weight=vw,
                            a_weight=1e-6, u_weight=1e-1,
                            q_weight_terminal=qw, v_weight_terminal=vw)
    lim = make_joint_limits(m, u_limit=jnp.full(12, 80.0, dtype),
                            v_limit=jnp.full(12, 15.0, dtype))
    Rw, pw = forward_kinematics(m, q0)
    plc = np.stack(
        [np.asarray(frame_placement(m, m.frame_id(f), Rw, pw)[1])
         for f in feet])
    sched = ContactSchedule(nc=4).init([True] * 4, plc)
    T, N = 0.5, 20
    grid = discretize(sched, 0.0, T, N, dtype=dtype)
    solver = OS.OCPSolver(m, contacts, (cost,), lim, T=T, N=N)
    v0 = jnp.zeros(18, dtype)
    sol = solver.init_solution(grid, q0, v0)

    upd = solver._update

    # ---- B = 1: per-update latency (the reference's number) ------------
    sol1, kkt, _, _ = upd((cost,), sol, grid, q0, v0)
    jax.block_until_ready(kkt)
    t0 = time.perf_counter()
    s = sol1
    for _ in range(args.reps):
        s, kkt, _, _ = upd((cost,), s, grid, q0, v0)
    jax.block_until_ready(kkt)
    total = time.perf_counter() - t0
    print(f"B=1:   {args.reps} updates in {total:.3f} s -> "
          f"{total / args.reps * 1e3:.3f} ms/update "
          f"({args.reps / total:.0f} updates/s), kkt={float(kkt):.3e}")

    # ---- batched: the TPU throughput axis ------------------------------
    B = args.batch
    sols = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape),
                        sol1)
    q0s = jnp.broadcast_to(q0, (B, m.nq))
    v0s = jnp.broadcast_to(v0, (B, m.nv))
    def one(s, qq, vv):
        out = OS._update(m, contacts, lim, solver.options.barrier,
                         solver.options.fraction_to_boundary_rule, 0,
                         (cost,), s, grid, qq, vv,
                         use_pallas=solver.use_pallas,
                         use_chain=solver.use_chain)
        return out[0], out[1]

    bupd = jax.jit(jax.vmap(one))
    sols, kkts = bupd(sols, q0s, v0s)
    jax.block_until_ready(kkts)
    reps_b = max(args.reps // 10, 10)
    t0 = time.perf_counter()
    for _ in range(reps_b):
        sols, kkts = bupd(sols, q0s, v0s)
    jax.block_until_ready(kkts)
    total = time.perf_counter() - t0
    print(f"B={B}: {reps_b} fleet updates in {total:.3f} s -> "
          f"{total / reps_b * 1e3:.2f} ms/fleet-update "
          f"({B * reps_b / total:.0f} updates/s), "
          f"max kkt={float(jnp.max(kkts)):.3e}")


if __name__ == "__main__":
    main()
