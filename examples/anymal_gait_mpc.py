"""ANYmal whole-body MPC for the remaining periodic gaits, closed loop.

Counterpart of the reference's examples/anymal/mpc/{pace,crawl,
flying_trot}.py (reference src/mpc/mpc_pace.cpp:372, mpc_crawl.cpp:389,
mpc_flying_trot.cpp:368): one script, gait selected on the command line —
the TPU build's gait engine (mpc/gait_mpc.py) parameterizes the same
stance/swing machinery the reference duplicates per class.

Run: JAX_PLATFORMS=cpu python examples/anymal_gait_mpc.py [pace|crawl|flying_trot]
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
from robotoc_tpu.mpc import MPCCrawl, MPCFlyingTrot, MPCPace
from robotoc_tpu.sim.mpc_simulation import MPCSimulation
from robotoc_tpu.sim.simulator import LeggedSimulator

GAITS = {
    # gait -> (class, step [m/step], swing_time, swing_height)
    # pace note: simultaneous lateral-pair lift is only marginally
    # stable on the simple penalty-ground plant (the reference demos it
    # in PyBullet); the gait walks but with visible roll oscillation
    "pace": (MPCPace, np.array([0.05, 0, 0]), 0.25, 0.08),
    "crawl": (MPCCrawl, np.array([0.08, 0, 0]), 0.25, 0.08),
    "flying_trot": (MPCFlyingTrot, np.array([0.15, 0, 0]), 0.20, 0.10),
}


def main():
    gait = sys.argv[1] if len(sys.argv) > 1 else "pace"
    cls, step, swing_time, swing_height = GAITS[gait]
    m = load_robot("anymal")
    T, N = 0.5, 20
    mpc = cls(m, T=T, N=N)
    planner = mpc.make_planner()
    planner.set_gait_pattern(step, 0.0)
    if gait == "flying_trot":
        mpc.set_gait_pattern(planner, swing_height=swing_height,
                             swing_time=swing_time, flying_time=0.06,
                             swing_start_time=0.5)
    else:
        mpc.set_gait_pattern(planner, swing_height=swing_height,
                             swing_time=swing_time, stance_time=0.0,
                             swing_start_time=0.5)

    q0 = jnp.asarray([0, 0, 0.4792, 0, 0, 0, 1, -0.1, 0.7, -1.0,
                      -0.1, -0.7, 1.0, 0.1, 0.7, -1.0, 0.1, -0.7, 1.0])
    v0 = jnp.zeros(18)
    kkt0 = mpc.init(0.0, q0, v0, num_iters=30)
    print(f"{gait}: init KKT {kkt0:.3e}")

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


if __name__ == "__main__":
    main()
