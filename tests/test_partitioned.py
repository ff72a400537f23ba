"""Cross-chip time-partitioned Riccati (riccati/partitioned.py) vs the
serial sweep, on the 8-virtual-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8).

The reference has no distributed axis at all (SURVEY.md §2.16); this is
the TPU-native horizon-parallel path: per-device suffix scans + ONE
all_gather of block aggregates.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from robotoc_tpu.core.structs import LQRData
from robotoc_tpu.riccati import lqr, partitioned


def random_lqr(key, N, nx=12, nu=4, dtype=jnp.float64):
    ks = jax.random.split(key, 12)
    A = (0.95 * jnp.eye(nx, dtype=dtype)
         + 0.05 * jax.random.normal(ks[0], (N, nx, nx), dtype))
    B = jax.random.normal(ks[1], (N, nx, nu), dtype)
    xres = 0.1 * jax.random.normal(ks[2], (N, nx), dtype)
    W = jax.random.normal(ks[3], (N, nx, nx), dtype)
    Qxx = W @ jnp.swapaxes(W, -1, -2) / nx + 0.1 * jnp.eye(nx, dtype=dtype)
    Wu = jax.random.normal(ks[4], (N, nu, nu), dtype)
    Quu = Wu @ jnp.swapaxes(Wu, -1, -2) / nu + jnp.eye(nu, dtype=dtype)
    Qxu = 0.05 * jax.random.normal(ks[5], (N, nx, nu), dtype)
    lx = jax.random.normal(ks[6], (N, nx), dtype)
    lu = jax.random.normal(ks[7], (N, nu), dtype)
    WN = jax.random.normal(ks[8], (nx, nx), dtype)
    QxxN = WN @ WN.T / nx + 0.1 * jnp.eye(nx, dtype=dtype)
    lxN = jax.random.normal(ks[9], (nx,), dtype)
    dx0 = jax.random.normal(ks[10], (nx,), dtype)
    return LQRData(A=A, B=B, xres=xres, Qxx=Qxx, Qxu=Qxu, Quu=Quu,
                   lx=lx, lu=lu, Qxx_N=QxxN, lx_N=lxN), dx0


@pytest.mark.parametrize("N", [24, 63])
def test_partitioned_matches_serial(N):
    assert jax.device_count() >= 8
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("tp",))
    data, dx0 = random_lqr(jax.random.PRNGKey(N), N)
    dx_s, du_s, dlmd_s, _ = jax.jit(lqr.solve)(data, dx0)
    psolve = jax.jit(partitioned.make_solve(mesh, "tp"))
    dx_p, du_p, dlmd_p, pol = psolve(data, dx0)
    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_s),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(du_p), np.asarray(du_s),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(dlmd_p), np.asarray(dlmd_s),
                               rtol=1e-7, atol=1e-7)


def test_partitioned_constrained_matches_serial():
    """Switching-constraint rows via the null-space transform."""
    from tests.test_switching import random_lqr_sw

    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("tp",))
    data, dx0 = random_lqr_sw(jax.random.PRNGKey(7))
    dx_s, du_s, dlmd_s, pol_s = jax.jit(lqr.solve)(data, dx0)
    psolve = jax.jit(partitioned.make_solve(mesh, "tp"))
    dx_p, du_p, dlmd_p, pol_p = psolve(data, dx0)
    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_s),
                               rtol=1e-7, atol=1e-7)
    np.testing.assert_allclose(np.asarray(du_p), np.asarray(du_s),
                               rtol=1e-7, atol=1e-7)
    xi_s = (jnp.einsum("kfx,kx->kf", pol_s.Mx, dx_s[:-1]) + pol_s.mx) \
        * data.sw
    xi_p = (jnp.einsum("kfx,kx->kf", pol_p.Mx, dx_p[:-1]) + pol_p.mx) \
        * data.sw
    np.testing.assert_allclose(np.asarray(xi_p), np.asarray(xi_s),
                               rtol=1e-6, atol=1e-7)


def test_partitioned_long_horizon():
    """The target regime: long horizon, time axis sharded 8 ways."""
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("tp",))
    data, dx0 = random_lqr(jax.random.PRNGKey(0), 512, nx=8, nu=3)
    dx_s = jax.jit(lqr.solve)(data, dx0)[0]
    dx_p = jax.jit(partitioned.make_solve(mesh, "tp"))(data, dx0)[0]
    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_s),
                               rtol=1e-7, atol=1e-7)


def test_ocp_solve_with_partitioned_riccati():
    """Full contact OCP solve with the horizon sharded over the mesh:
    same converged solution as the serial backend."""
    import jax.numpy as jnp

    from robotoc_tpu.constraints.joint_limits import make_joint_limits
    from robotoc_tpu.costs.config_cost import make_config_cost
    from robotoc_tpu.models import (forward_kinematics, frame_placement,
                                    load_robot)
    from robotoc_tpu.models.contacts import make_contacts
    from robotoc_tpu.planner.contact_sequence import (ContactSchedule,
                                                      discretize)
    from robotoc_tpu.solver import ocp_solver as OS

    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("tp",))
    m = load_robot("anymal")
    feet = ["LF_FOOT", "LH_FOOT", "RF_FOOT", "RH_FOOT"]
    contacts = make_contacts(m, feet, baumgarte_time_step=0.04)
    q0 = jnp.asarray([0, 0, 0.4792, 0, 0, 0, 1, -0.1, 0.7, -1.0,
                      -0.1, -0.7, 1.0, 0.1, 0.7, -1.0, 0.1, -0.7, 1.0])
    qw = jnp.asarray([0, 0, 0, 1e4, 1e4, 1e4] + [0.01] * 12)
    vw = jnp.asarray([10.0] * 6 + [1.0] * 12)
    cost = make_config_cost(m, q_ref=q0, q_weight=qw, v_weight=vw,
                            a_weight=1e-6, u_weight=1e-2,
                            q_weight_terminal=qw, v_weight_terminal=vw)
    lim = make_joint_limits(m, u_limit=jnp.full(12, 80.0),
                            v_limit=jnp.full(12, 15.0))
    Rw, pw = forward_kinematics(m, q0)
    plc = np.stack(
        [np.asarray(frame_placement(m, m.frame_id(f), Rw, pw)[1])
         for f in feet])
    sched = ContactSchedule(nc=4).init([True] * 4, plc)
    N = 31    # 32 slots -> 4 per device
    grid = discretize(sched, 0.0, 0.025 * N, N)
    v0 = jnp.zeros(18)
    sol0 = OS.make_initial_solution(m, contacts, lim, 1e-3, grid, q0, v0)

    import functools as ft
    solve_ser = jax.jit(ft.partial(
        OS._solve, m, contacts, lim, 12, 1e-6, 1e-3, 0.995, 0,
        riccati=lqr))
    solve_par = jax.jit(ft.partial(
        OS._solve, m, contacts, lim, 12, 1e-6, 1e-3, 0.995, 0,
        riccati=partitioned.PartitionedRiccati(mesh, "tp")))
    s_ser, st_ser = solve_ser((cost,), sol0, grid, q0, v0)
    s_par, st_par = solve_par((cost,), sol0, grid, q0, v0)
    assert bool(st_ser["convergence"]) and bool(st_par["convergence"])
    np.testing.assert_allclose(np.asarray(s_par.q), np.asarray(s_ser.q),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(s_par.u), np.asarray(s_ser.u),
                               atol=1e-6)
