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


def random_constrained_lqr(key, N=12, nx=8, nu=4, nf=3):
    """Random LQR data with a pure-state/control equality constraint
    (masked rows) on a few interior stages."""
    data, dx0 = random_lqr(key, N=N, nx=nx, nu=nu)
    ks = jax.random.split(jax.random.fold_in(key, 99), 4)
    Phix = jax.random.normal(ks[0], (N, nf, nx))
    Phiu = jax.random.normal(ks[1], (N, nf, nu))
    Pc = jax.random.normal(ks[2], (N, nf))
    sw = jnp.zeros((N, nf))
    # stage 3: all rows active; stage 7: partial rows
    sw = sw.at[3, :].set(1.0).at[7, :2].set(1.0)
    data = data.replace(Phix=Phix * sw[..., None],
                         Phiu=Phiu * sw[..., None],
                         Pc=Pc * sw, sw=sw)
    return data, dx0


@pytest.mark.parametrize("seed", [0, 2])
def test_constrained_parallel_matches_serial(seed):
    """Null-space element transform (parallel.py) vs the serial
    constrained Schur branch (reference riccati_factorizer.cpp:58-89):
    same directions, value function, gains and multipliers."""
    data, dx0 = random_constrained_lqr(jax.random.PRNGKey(seed))
    dx_s, du_s, dl_s, pol_s = lqr.solve(data, dx0)
    dx_p, du_p, dl_p, pol_p = parallel.solve(data, dx0)
    np.testing.assert_allclose(dx_p, dx_s, atol=1e-7)
    np.testing.assert_allclose(du_p, du_s, atol=1e-7)
    np.testing.assert_allclose(dl_p, dl_s, atol=1e-7)
    np.testing.assert_allclose(pol_p.P, pol_s.P, atol=1e-7, rtol=1e-7)
    np.testing.assert_allclose(pol_p.K, pol_s.K, atol=1e-7)
    # multiplier factorization agrees on ACTIVE rows
    dxi_s = (jnp.einsum("kfx,kx->kf", pol_s.Mx, dx_s[:-1])
             + pol_s.mx) * data.sw
    dxi_p = (jnp.einsum("kfx,kx->kf", pol_p.Mx, dx_p[:-1])
             + pol_p.mx) * data.sw
    np.testing.assert_allclose(dxi_p, dxi_s, atol=1e-7)
    # and the constraint holds at the constrained stages
    for i in (3, 7):
        r = (data.Phix[i] @ dx_p[i] + data.Phiu[i] @ du_p[i]
             + data.Pc[i]) * data.sw[i]
        np.testing.assert_allclose(r, 0.0, atol=1e-8)
