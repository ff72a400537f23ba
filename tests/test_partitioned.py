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
