"""A1 crawl MPC over uneven terrain
(reference examples/a1/mpc/crawl_terrain.py: MPCCrawl, step_length
[0.25,0,0], swing 0.25 s, stance 0.05 s, swing_start 0.5 s, with the
PyBullet terrain replaced by the shared analytic height map — the
planner snaps placements to it and the penalty-contact plant evaluates
the same surface under each foot).

Run: JAX_PLATFORMS=cpu python examples/a1_crawl_terrain_mpc.py
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

from a1_trot_mpc import A1_FEET, Q0
from robotoc_tpu.models import load_robot
from robotoc_tpu.mpc import MPCCrawl
from robotoc_tpu.sim.mpc_simulation import MPCSimulation
from robotoc_tpu.sim.simulator import LeggedSimulator


def terrain(x, y):
    """Rolling bumps + gentle ramp (jnp-traceable; the host planner
    calls it with floats)."""
    return 0.03 * jnp.sin(4.0 * x) * jnp.cos(3.0 * y) + 0.04 * x


def main():
    m = load_robot("a1")
    mpc = MPCCrawl(m, T=0.5, N=20, feet=A1_FEET,
                   baumgarte_time_step=0.05)
    planner = mpc.make_planner(terrain=lambda x, y: float(terrain(x, y)))
    # reference crawl_terrain.py:17-35 (step length reduced for the
    # stiffer penalty plant; the reference demos 0.25 in PyBullet)
    planner.set_gait_pattern(np.array([0.12, 0.0, 0.0]), 0.0)
    mpc.set_gait_pattern(planner, swing_height=0.1, swing_time=0.25,
                         stance_time=0.05, swing_start_time=0.5)
    q0 = jnp.asarray(Q0)
    kkt0 = mpc.init(0.0, q0, jnp.zeros(m.nv), num_iters=10)
    print(f"init KKT: {kkt0:.3e}")

    sim = LeggedSimulator(m, mpc.contacts, sim_dt=2.5e-4, terrain=terrain)
    driver = MPCSimulation(sim)
    sim_time = float(os.environ.get("SIM_TIME", 1.0))
    log = driver.run(mpc, t0=0.0, q0=np.asarray(q0),
                     simulation_time=sim_time, control_dt=0.0025,
                     feedback_delay=True)
    arrs = log.as_arrays()
    print(f"steps: {len(arrs['t'])}  "
          f"x traveled: {arrs['q'][-1, 0] - arrs['q'][0, 0]:.3f} m  "
          f"base z range: [{arrs['q'][:, 2].min():.3f}, "
          f"{arrs['q'][:, 2].max():.3f}]  "
          f"final kkt: {arrs['kkt'][-1]:.3e}")


if __name__ == "__main__":
    main()
