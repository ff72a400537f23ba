"""ANYmal trot whole-body MPC in closed loop via the MPCSimulation driver.

Counterpart of the reference's examples/anymal/mpc/trot.py +
robotoc_sim/mpc_simulation.py (400 Hz control, max_iter=2 per update). The
plant is the penalty-ground forward-dynamics simulator
(robotoc_tpu/sim/simulator.py) instead of PyBullet; the driver applies the
interpolated LQR PD+feedforward policy each tick
(mpc/control_policy.py).

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
from robotoc_tpu.sim.mpc_simulation import MPCSimulation
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
    driver = MPCSimulation(sim)
    sim_time = float(os.environ.get("SIM_TIME", 2.0))
    log = driver.run(mpc, t0=0.0, q0=np.asarray(q0),
                     simulation_time=sim_time, control_dt=0.0025,
                     feedback_policy=True, verbose=False)
    arrs = log.as_arrays()
    print(f"steps: {len(arrs['t'])}  "
          f"x traveled: {arrs['q'][-1, 0] - arrs['q'][0, 0]:.3f} m  "
          f"base z range: [{arrs['q'][:, 2].min():.3f}, "
          f"{arrs['q'][:, 2].max():.3f}]  "
          f"median kkt: {np.median(arrs['kkt']):.3e}")
    if os.environ.get("LOG_DIR"):
        print("logs saved at", log.save(os.environ["LOG_DIR"]))


if __name__ == "__main__":
    main()
