"""iCub biped walking MPC (surface contacts + contact wrench cones).

Counterpart of the reference's examples/icub/mpc/walk.py: MPCBipedWalk on
the icub lower half, rectangular wrench cones X=0.05, Y=0.025, T=0.7, N=25.
Runs the MPC update loop open-plant (re-planning from the predicted state)
and reports the KKT error per control step.

Run: JAX_PLATFORMS=cpu python examples/icub_walk_mpc.py
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

from robotoc_tpu.models import forward_kinematics, frame_placement, load_robot
from robotoc_tpu.mpc.gait_mpc import MPCBipedWalk


def main():
    m = load_robot("icub_lower_half")
    T, N = 0.7, 25
    mpc = MPCBipedWalk(m, T=T, N=N)
    mpc.set_wrench_cone_rectangular(X=0.05, Y=0.025)

    planner = mpc.make_planner()
    step_length = np.array([0.22, 0, 0])
    planner.set_gait_pattern(step_length, 0.0)
    mpc.set_gait_pattern(planner, swing_height=0.1, swing_time=0.7,
                         stance_time=0.0, swing_start_time=0.5)

    knee = np.pi / 6
    q0 = np.array([0, 0, 0, 0, 0, 0, 1,
                   0.5 * knee, 0, 0, -knee, 0.5 * knee, 0,
                   0.5 * knee, 0, 0, -knee, 0.5 * knee, 0])
    Rw, pw = forward_kinematics(m, jnp.asarray(q0))
    zs = [np.asarray(frame_placement(m, m.frame_id(f), Rw, pw)[1])[2]
          for f in ["l_sole", "r_sole"]]
    q0[2] = -0.5 * (zs[0] + zs[1])
    q0 = jnp.asarray(q0)
    v0 = jnp.zeros(m.nv)

    kkt0 = mpc.init(0.0, q0, v0, num_iters=40)
    print(f"init KKT: {kkt0:.3e}")

    # MPC loop against the solver's own prediction (plant-free regression,
    # like the reference's KKT-per-step logging in mpc_simulation.py:54-56)
    control_dt = 0.0025
    t = 0.0
    q, v = q0, v0
    steps = int(float(os.environ.get("SIM_TIME", 1.0)) / control_dt)
    for k in range(steps):
        kkt = mpc.update_solution(t, control_dt, q, v, max_iter=2)
        # roll the predicted state forward one control step
        from robotoc_tpu.models import robot as rm
        q = rm.integrate(m, q, control_dt * mpc.sol.v[0])
        v = mpc.sol.v[0] + control_dt * mpc.sol.a[0]
        t += control_dt
        if k % 40 == 0:
            print(f"t={t:.3f}  kkt={kkt:.3e}  com x={float(q[0]):.3f}")
    print(f"final t={t:.3f}, kkt={kkt:.3e}")


if __name__ == "__main__":
    main()
