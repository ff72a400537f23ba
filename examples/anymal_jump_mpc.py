"""ANYmal jump whole-body MPC (open-loop OCP warm start + MPC updates).

Counterpart of the reference's examples/anymal/mpc/jump.py + MPCJump
(reference src/mpc/mpc_jump.cpp:13-318): set the jump pattern, init to
convergence (optionally with switching-time optimization), then run MPC
updates across lift-off and landing, and write the trajectory animation.

Run: JAX_PLATFORMS=cpu python examples/anymal_jump_mpc.py [--sto]
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
from robotoc_tpu.mpc import MPCJump


def main():
    sto = "--sto" in sys.argv
    m = load_robot("anymal")
    mpc = MPCJump(m, T=0.85, N=10)
    mpc.set_jump_pattern(jump_length=[0.15, 0.0, 0.0], jump_yaw=0.0,
                         flying_time=0.25, ground_time=0.3)
    q0 = jnp.asarray([0, 0, 0.4792, 0, 0, 0, 1, -0.1, 0.7, -1.0,
                      -0.1, -0.7, 1.0, 0.1, 0.7, -1.0, 0.1, -0.7, 1.0])
    v0 = jnp.zeros(18)
    kkt0 = mpc.init(0.0, q0, v0, num_iters=80, sto=sto)
    print(f"init KKT ({'STO' if sto else 'fixed times'}): {kkt0:.3e}")

    # open-loop playback: advance the state with the plan's own
    # prediction (the closed-loop sim counterpart is
    # examples/anymal_trot_mpc.py; the jump plant needs flight-phase
    # contact handling the simple penalty sim does not model)
    dt_mpc = 0.85 / 10
    q, v = q0, v0
    kkts = []
    for k in range(7):
        t = k * dt_mpc
        kkts.append(mpc.update_solution(float(t), dt_mpc, q, v,
                                        max_iter=2))
        q, v = mpc.sol.q[1], mpc.sol.v[1]
    print("MPC update KKT trace:",
          " ".join(f"{k:.1e}" for k in kkts))

    from robotoc_tpu.utils.trajectory_viewer import TrajectoryViewer
    sol = mpc.sol
    out = TrajectoryViewer(m, contacts=mpc.contacts).write_html(
        "anymal_jump_mpc.html", sol.q, dt=0.85 / 10,
        forces=np.asarray(sol.f), title="ANYmal jump MPC")
    print("trajectory animation:", out)


if __name__ == "__main__":
    main()
