"""MPCJump: packaged jump MPC (reference src/mpc/mpc_jump.cpp:13-318)."""
import numpy as np

import jax.numpy as jnp

from robotoc_tpu.models import load_robot
from robotoc_tpu.mpc import MPCJump

Q0 = jnp.array([0, 0, 0.4792, 0, 0, 0, 1, -0.1, 0.7, -1.0,
                -0.1, -0.7, 1.0, 0.1, 0.7, -1.0, 0.1, -0.7, 1.0])


def test_mpc_jump_init_and_updates():
    m = load_robot("anymal")
    mpc = MPCJump(m, T=0.85, N=10)
    mpc.set_jump_pattern(jump_length=[0.1, 0.0, 0.0], jump_yaw=0.0,
                         flying_time=0.25, ground_time=0.3)
    v0 = jnp.zeros(18)
    kkt0 = mpc.init(0.0, Q0, v0, num_iters=60)
    assert np.isfinite(kkt0) and kkt0 < 1e-2, f"init kkt={kkt0}"
    # landing targets moved 10 cm forward
    np.testing.assert_allclose(mpc._p_land[:, 0] - mpc._p_stance[:, 0],
                               0.1, atol=1e-12)
    # MPC updates across lift-off and landing (same shapes -> no recompile)
    kkts = []
    for t in [0.0, 0.1, 0.25, 0.35, 0.5, 0.6]:
        kkts.append(mpc.update_solution(t, 0.05, Q0, v0, max_iter=2))
    assert all(np.isfinite(k) for k in kkts), kkts
    # control interface
    u0 = np.asarray(mpc.get_initial_control_input())
    assert u0.shape == (12,) and np.all(np.isfinite(u0))
    pol = mpc.get_control_policy(0.01)
    assert np.all(np.isfinite(np.asarray(pol.tauJ)))
