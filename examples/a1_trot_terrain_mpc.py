"""A1 trot MPC over uneven terrain
(reference examples/a1/mpc/trot_terrain.py + the PyBullet heightfield in
robotoc_sim/legged_simulator.py:16-54).

The terrain is a smooth analytic height map shared by BOTH sides:
  * the foot-step planner snaps planned placements to the surface, so the
    swing/contact references climb with the ground;
  * the penalty-contact simulator evaluates the same height map under
    each foot.

Run: JAX_PLATFORMS=cpu python examples/a1_trot_terrain_mpc.py
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

from a1_trot_mpc import A1_FEET, Q0, build_mpc
from robotoc_tpu.models import load_robot
from robotoc_tpu.sim.mpc_simulation import MPCSimulation
from robotoc_tpu.sim.simulator import LeggedSimulator


def terrain(x, y):
    """Gentle ramp + rolling bumps (jnp-traceable; also called with floats
    by the host-side planner)."""
    return 0.04 * jnp.sin(4.0 * x) * jnp.cos(3.0 * y) + 0.05 * x


def main():
    m, mpc = build_mpc(terrain=lambda x, y: float(terrain(x, y)))
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
          f"base z range: [{arrs['q'][:, 2].min():.3f}, "
          f"{arrs['q'][:, 2].max():.3f}]  "
          f"final kkt: {arrs['kkt'][-1]:.3e}")


if __name__ == "__main__":
    main()
