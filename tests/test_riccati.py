"""Parallel (associative-scan) Riccati vs the serial scan oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robotoc_tpu.core.structs import LQRData
from robotoc_tpu.riccati import lqr, parallel


def random_lqr(key, N=15, nx=8, nu=3):
    ks = jax.random.split(key, 12)
    A = 0.9 * jnp.eye(nx) + 0.1 * jax.random.normal(ks[0], (N, nx, nx))
    B = jax.random.normal(ks[1], (N, nx, nu))
    xres = jax.random.normal(ks[2], (N, nx))
    W = jax.random.normal(ks[3], (N, nx, nx))
    Qxx = W @ jnp.swapaxes(W, -1, -2) + 0.1 * jnp.eye(nx)
    Wu = jax.random.normal(ks[4], (N, nu, nu))
    Quu = Wu @ jnp.swapaxes(Wu, -1, -2) + 1.0 * jnp.eye(nu)
    Qxu = 0.1 * jax.random.normal(ks[5], (N, nx, nu))
    lx = jax.random.normal(ks[6], (N, nx))
    lu = jax.random.normal(ks[7], (N, nu))
    WN = jax.random.normal(ks[8], (nx, nx))
    QxxN = WN @ WN.T + 0.1 * jnp.eye(nx)
    lxN = jax.random.normal(ks[9], (nx,))
    dx0 = jax.random.normal(ks[10], (nx,))
    return LQRData(A=A, B=B, xres=xres, Qxx=Qxx, Qxu=Qxu, Quu=Quu,
                   lx=lx, lu=lu, Qxx_N=QxxN, lx_N=lxN), dx0


@pytest.mark.parametrize("seed", [0, 1])
def test_parallel_matches_serial(seed):
    data, dx0 = random_lqr(jax.random.PRNGKey(seed))
    dx_s, du_s, dl_s, pol_s = lqr.solve(data, dx0)
    dx_p, du_p, dl_p, pol_p = parallel.solve(data, dx0)
    np.testing.assert_allclose(pol_p.P, pol_s.P, atol=1e-8, rtol=1e-8)
    np.testing.assert_allclose(pol_p.p, pol_s.p, atol=1e-8)
    np.testing.assert_allclose(pol_p.K, pol_s.K, atol=1e-8)
    np.testing.assert_allclose(dx_p, dx_s, atol=1e-8)
    np.testing.assert_allclose(du_p, du_s, atol=1e-8)
    np.testing.assert_allclose(dl_p, dl_s, atol=1e-8)


def test_serial_solves_kkt():
    """The LQR solution must satisfy the QP optimality conditions."""
    data, dx0 = random_lqr(jax.random.PRNGKey(7), N=10, nx=6, nu=2)
    dx, du, dlmd, _ = lqr.solve(data, dx0)
    N = data.A.shape[0]
    for i in range(N):
        # dynamics
        np.testing.assert_allclose(
            dx[i + 1], data.A[i] @ dx[i] + data.B[i] @ du[i] + data.xres[i],
            atol=1e-9)
        # stationarity wrt u: Quu du + Qxu^T dx + lu + B^T lmd_{i+1} = 0
        ru = (data.Quu[i] @ du[i] + data.Qxu[i].T @ dx[i] + data.lu[i]
              + data.B[i].T @ dlmd[i + 1])
        np.testing.assert_allclose(ru, 0.0, atol=1e-8)
        # stationarity wrt x
        rx = (data.Qxx[i] @ dx[i] + data.Qxu[i] @ du[i] + data.lx[i]
              + data.A[i].T @ dlmd[i + 1] - dlmd[i])
        np.testing.assert_allclose(rx, 0.0, atol=1e-8)
    rN = data.Qxx_N @ dx[N] + data.lx_N - dlmd[N]
    np.testing.assert_allclose(rN, 0.0, atol=1e-8)
