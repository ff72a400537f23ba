"""ANYmal trot whole-body MPC in closed loop with the jitted simulator.

Counterpart of the reference's examples/a1/mpc/trot.py +
robotoc_sim/mpc_simulation.py (400 Hz control, max_iter=2 per update). The
plant here is the penalty-ground forward-dynamics simulator
(robotoc_tpu/sim/simulator.py) instead of PyBullet.

Run: JAX_PLATFORMS=cpu python examples/anymal_trot_mpc.py  (or on TPU)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp

from robotoc_tpu.models import load_robot
from robotoc_tpu.mpc import MPCTrot
from robotoc_tpu.sim.simulator import LeggedSimulator


def main():
    m = load_robot("anymal")
    T, N = 0.5, 20
    mpc = MPCTrot(m, T=T, N=N)
    planner = mpc.make_planner()
    planner.set_gait_pattern(np.array([0.15, 0, 0]), 0.0)
    mpc.set_gait_pattern(planner, swing_height=0.1, swing_time=0.25,
                         stance_time=0.0, swing_start_time=0.5)

    q0 = jnp.asarray([0, 0, 0.4792, 0, 0, 0, 1, -0.1, 0.7, -1.0,
                      -0.1, -0.7, 1.0, 0.1, 0.7, -1.0, 0.1, -0.7, 1.0])
    v0 = jnp.zeros(18)
    kkt0 = mpc.init(0.0, q0, v0, num_iters=30)
    print(f"init KKT: {kkt0:.3e}")

    sim = LeggedSimulator(m, mpc.contacts, sim_dt=2.5e-4)
    state = sim.init(q0, v0)
    control_dt = 0.0025                      # 400 Hz MPC
    n_sub = int(round(control_dt / sim.sim_dt))
    sim_time = float(os.environ.get("SIM_TIME", 2.0))
    steps = int(sim_time / control_dt)
    for k in range(steps):
        t = float(state.t)
        kkt = mpc.update_solution(t, control_dt, state.q, state.v,
                                  max_iter=2)
        policy = mpc.get_control_policy(t)
        u = policy.control_input(np.asarray(state.q)[-m.dimu:],
                                 np.asarray(state.v)[-m.dimu:])
        state = sim.step(state, jnp.asarray(u), n_substeps=n_sub)
        if k % 40 == 0:
            print(f"t={t:.3f}  kkt={kkt:.3e}  base z="
                  f"{float(state.q[2]):.3f}  x={float(state.q[0]):.3f}")
    print(f"final: x={float(state.q[0]):.3f} m traveled, "
          f"base z={float(state.q[2]):.3f}")


if __name__ == "__main__":
    main()
