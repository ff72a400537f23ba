"""Compile-check the Pallas chain kernel on the current TPU toolchain.

Round-3 postmortem tool: the driver's AOT stack rejected the chain
kernel's Mosaic lowering ("Broadcast in both sublanes and lanes",
vector<1x1xf32> -> vector<3x128xf32>) while other jax/libtpu stacks
accepted it. This compiles the kernel alone (and optionally the full
Pallas update) so a lowering regression is a 30-second check, not a
crashed bench.

Usage: python tools/compile_chain.py [--full]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from robotoc_tpu.models import load_robot
    from robotoc_tpu.models.contacts import make_contacts
    from robotoc_tpu.ops import pallas_chain as pchain

    dtype = jnp.float32
    m = load_robot("anymal", dtype=dtype)
    feet = ["LF_FOOT", "LH_FOOT", "RF_FOOT", "RH_FOOT"]
    contacts = make_contacts(m, feet, baumgarte_time_step=0.04)
    assert pchain.chain_supported(m, contacts)
    S = 2688  # B=128 x N=21 flagship shape
    q = jnp.zeros((S, m.nq), dtype).at[:, 6].set(1.0)
    v = jnp.zeros((S, m.nv), dtype)
    a = jnp.zeros((S, m.nv), dtype)
    f = jnp.zeros((S, contacts.max_dimf), dtype)
    fric = jnp.full((S, contacts.n_contacts), 0.7, dtype)
    p_ref = jnp.zeros((S, contacts.n_contacts, 3), dtype)

    fn = pchain.get_chain(m, contacts)
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(q, v, a, f, fric, p_ref)
    compiled = lowered.compile()
    print(f"chain kernel compiled ok in {time.perf_counter()-t0:.1f}s")
    out = compiled(q, v, a, f, fric, p_ref)
    jax.block_until_ready(out)
    print("chain kernel ran ok, tau[0,0] =", float(out["tau"][0, 0]))

    if "--full" in sys.argv:
        from robotoc_tpu.mpc.mpc_trot import MPCTrot
        from robotoc_tpu.solver import ocp_solver as OS

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
        B = 128
        sols = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), sol0)
        q0s = jnp.broadcast_to(q0, (B, m.nq))
        v0s = jnp.zeros((B, 18), dtype)

        def upd(s, qq, vv):
            return OS._update(m, mpc.contacts, mpc.limits, 1e-3, 0.995,
                              mpc.n_reserved, costs, s, grid, qq, vv,
                              enable_sw=True, use_pallas=True,
                              use_chain=True)[1]

        t0 = time.perf_counter()
        c = jax.jit(jax.vmap(upd)).lower(sols, q0s, v0s).compile()
        print(f"full Pallas+chain update compiled ok in "
              f"{time.perf_counter()-t0:.1f}s")
        kkt = c(sols, q0s, v0s)
        jax.block_until_ready(kkt)
        print("full update ran ok, kkt[0] =", float(kkt[0]))


if __name__ == "__main__":
    main()
