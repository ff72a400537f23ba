"""B=1 MPC update latency on the real TPU (round-4 verdict weak #4:
sub-ms single-robot updates; the reference's implied budget is 2.5 ms
on a 4-thread desktop CPU, examples/a1/mpc/trot.py:54-59).

Measures the ANYmal standing parity scenario (the reference
ocp_benchmark.cpp:108-132 problem) three ways:

  * per-call wall latency — one device execute per update; in this
    environment that includes the axon tunnel's host->TPU round trip,
    which production (local PCIe) deployments do not pay;
  * chained device latency — K updates inside ONE jit (lax.scan), so
    the per-update figure is pure device compute, the number an MPC
    stack co-located with the TPU would see;
  * backend A/B — Pallas kernels vs the XLA path at B=1 (the Pallas
    layout runs batch-in-lanes, so a single scenario fills 1/128 lanes;
    whichever wins becomes the recommended B=1 configuration).

Usage: python tools/bench_latency.py [--reps 300] [--chain 16]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--reps", type=int, default=300)
parser.add_argument("--chain", type=int, default=16)
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
    v0 = jnp.zeros(18, dtype)
    sol0 = OS.make_initial_solution(m, contacts, lim, 1e-3, grid, q0, v0)
    on_tpu = jax.default_backend() not in ("cpu",)

    def bench_one(name, use_pallas, use_chain):
        upd = jax.jit(functools.partial(
            OS._update, m, contacts, lim, 1e-3, 0.995, 0, (cost,),
            use_pallas=use_pallas, use_chain=use_chain))

        def one(s):
            out = upd(s, grid, q0, v0)
            return out[0], out[1]

        s, kkt = one(sol0)
        jax.block_until_ready(kkt)
        for _ in range(5):
            s, kkt = one(s)
        jax.block_until_ready(kkt)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            s, kkt = one(s)
        jax.block_until_ready(kkt)
        wall_ms = (time.perf_counter() - t0) / args.reps * 1e3

        # chained: K updates in one executable -> pure device time
        K = args.chain

        def chained(s):
            def it(ss, _):
                out = OS._update(m, contacts, lim, 1e-3, 0.995, 0,
                                 (cost,), ss, grid, q0, v0,
                                 use_pallas=use_pallas,
                                 use_chain=use_chain)
                return out[0], out[1]
            s, kkts = jax.lax.scan(it, s, None, length=K)
            return s, kkts[-1]

        ch = jax.jit(chained)
        s2, kkt2 = ch(sol0)
        jax.block_until_ready(kkt2)
        t0 = time.perf_counter()
        reps_c = max(args.reps // K, 5)
        for _ in range(reps_c):
            s2, kkt2 = ch(s2)
        jax.block_until_ready(kkt2)
        dev_ms = (time.perf_counter() - t0) / (reps_c * K) * 1e3
        print(f"{name}: per-call {wall_ms:.3f} ms "
              f"(kkt {float(kkt):.2e}) | chained x{K}: "
              f"{dev_ms:.3f} ms/update (kkt {float(kkt2):.2e})",
              flush=True)
        return wall_ms, dev_ms

    bench_one("XLA path    ", False, False)
    if on_tpu:
        bench_one("Pallas path ", True, True)
        bench_one("Pallas -chain", True, False)


if __name__ == "__main__":
    main()
