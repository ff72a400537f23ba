"""A1 trot whole-body MPC in closed loop (reference examples/a1/mpc/trot.py).

Unitree A1: 4 point contacts (FL/RL/FR/RR feet), T=0.5, N=20, max_iter=2
MPC updates at 400 Hz with one-tick feedback delay — the reference's exact
benchmark cadence (examples/a1/mpc/trot.py:54-66). Uses the bundled
descriptions/a1.json (baked from the reference's a1_description URDF) and
the MPCSimulation driver against the penalty-contact plant.

Run: JAX_PLATFORMS=cpu python examples/a1_trot_mpc.py   (or on TPU)
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

A1_FEET = ["FL_foot", "RL_foot", "FR_foot", "RR_foot"]
Q0 = [0, 0, 0.3181, 0, 0, 0, 1,
      0.0, 0.67, -1.3,
      0.0, 0.67, -1.3,
      0.0, 0.67, -1.3,
      0.0, 0.67, -1.3]


def build_mpc(terrain=None, N=20):
    m = load_robot("a1")
    mpc = MPCTrot(m, T=0.5, N=N, feet=A1_FEET,
                  baumgarte_time_step=0.05)
    planner = mpc.make_planner(terrain=terrain)
    # reference gait: step_length [0.15, 0, 0], yaw pi/18, swing 0.25 s
    planner.set_gait_pattern(np.array([0.15, 0.0, 0.0]), np.pi / 18)
    mpc.set_gait_pattern(planner, swing_height=0.1, swing_time=0.25,
                         stance_time=0.0, swing_start_time=0.5)
    return m, mpc


def main():
    m, mpc = build_mpc()
    q0 = jnp.asarray(Q0)
    kkt0 = mpc.init(0.0, q0, jnp.zeros(m.nv), num_iters=10)
    print(f"init KKT: {kkt0:.3e}")

    sim = LeggedSimulator(m, mpc.contacts, sim_dt=2.5e-4)
    driver = MPCSimulation(sim)
    sim_time = float(os.environ.get("SIM_TIME", 1.0))
    log = driver.run(mpc, t0=0.0, q0=np.asarray(q0),
                     simulation_time=sim_time, control_dt=0.0025,
                     feedback_delay=True, verbose=False)
    arrs = log.as_arrays()
    print(f"steps: {len(arrs['t'])}  "
          f"base z range: [{arrs['q'][:, 2].min():.3f}, "
          f"{arrs['q'][:, 2].max():.3f}]  "
          f"final kkt: {arrs['kkt'][-1]:.3e}  "
          f"x traveled: {arrs['q'][-1, 0] - arrs['q'][0, 0]:.3f} m")


if __name__ == "__main__":
    main()
