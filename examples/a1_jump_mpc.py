"""A1 jump whole-body MPC (reference examples/a1/mpc/jump.py:
MPCJump with the 'vertical' jump pattern [0.1, 0, 0], flying 0.3 s,
ground 0.3 s; init to convergence, then MPC updates across lift-off
and landing in open-loop playback).

Run: JAX_PLATFORMS=cpu python examples/a1_jump_mpc.py [--sto]
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
from robotoc_tpu.mpc import MPCJump


def main():
    sto = "--sto" in sys.argv
    m = load_robot("a1")
    mpc = MPCJump(m, T=0.8, N=16, feet=A1_FEET,
                  baumgarte_time_step=0.05)
    mpc.set_jump_pattern(jump_length=[0.1, 0.0, 0.0], jump_yaw=0.0,
                         flying_time=0.25, ground_time=0.3)
    q0 = jnp.asarray(Q0)
    v0 = jnp.zeros(m.nv)
    kkt0 = mpc.init(0.0, q0, v0, num_iters=80, sto=sto)
    print(f"init KKT ({'STO' if sto else 'fixed times'}): {kkt0:.3e}")

    # open-loop playback with the plan's own state prediction (same
    # structure as examples/anymal_jump_mpc.py)
    dt_mpc = 0.8 / 16
    q, v = q0, v0
    kkts = []
    for k in range(7):
        t = k * dt_mpc
        kkts.append(mpc.update_solution(float(t), dt_mpc, q, v,
                                        max_iter=2))
        q, v = mpc.sol.q[1], mpc.sol.v[1]
    print("MPC update KKT trace:",
          " ".join(f"{k:.1e}" for k in kkts))
    qs = np.asarray(mpc.sol.q)
    print(f"apex base height: {qs[:, 2].max():.3f} m "
          f"(stand {float(q0[2]):.3f} m)")


if __name__ == "__main__":
    main()
