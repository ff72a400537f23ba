"""ANYmal C trot MPC (reference examples/anymal_c/mpc/trot.py).

The reference loads the ANYmal C URDF from the external
`anymal_c_description` pip package (examples/anymal_c/mpc/trot.py:9 —
the URDF itself is NOT bundled with the reference repo either); this
environment has no package egress, so the bundled ANYmal rigid-body data
stands in while the example reproduces the C-specific configuration:
0.575 m standing height, the C's wider default joint pose, 0.3 m steps
and 0.2 m swing apex, max_iter=1 MPC updates
(reference examples/anymal_c/mpc/trot.py:22-53).

Run: JAX_PLATFORMS=cpu python examples/anymal_c_trot_mpc.py
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

# reference examples/anymal_c/mpc/trot.py:38-42 (C standing pose)
Q0 = [0, 0, 0.575, 0, 0, 0, 1,
      -0.25, 0.6, -0.85,
      -0.25, -0.6, 0.85,
      0.25, 0.6, -0.85,
      0.25, -0.6, 0.85]


def main():
    m = load_robot("anymal")
    mpc = MPCTrot(m, T=0.5, N=20, baumgarte_time_step=0.05)
    planner = mpc.make_planner()
    # reference: step_length [0.3, 0, 0], swing_height 0.2, swing 0.25 s
    planner.set_gait_pattern(np.array([0.3, 0.0, 0.0]), 0.0)
    mpc.set_gait_pattern(planner, swing_height=0.2, swing_time=0.25,
                         stance_time=0.0, swing_start_time=0.5)
    q0 = jnp.asarray(Q0)
    kkt0 = mpc.init(0.0, q0, jnp.zeros(m.nv), num_iters=20)
    print(f"init KKT: {kkt0:.3e}")

    sim = LeggedSimulator(m, mpc.contacts, sim_dt=2.5e-4)
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
