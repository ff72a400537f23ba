"""Pallas Riccati backward sweep vs the serial scan (riccati/lqr.py).

Random well-conditioned LQR data, constrained (masked switching rows) and
unconstrained, single-scenario and under the fleet vmap. Interpreter mode
on CPU; the compiled path is exercised by bench.py on TPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robotoc_tpu.core.structs import LQRData
from robotoc_tpu.riccati import lqr
from robotoc_tpu.riccati import pallas_scan


def _random_data(key, N, nx, nu, nf, dtype=jnp.float64):
    ks = jax.random.split(key, 16)
    r = lambda i, sh: 0.3 * jax.random.normal(ks[i], sh, dtype)
    spd = lambda X, n: X @ jnp.swapaxes(X, -1, -2) + 2.0 * jnp.eye(n, dtype=dtype)
    A = r(0, (N, nx, nx)) + jnp.eye(nx, dtype=dtype)
    B = r(1, (N, nx, nu))
    Qxx = spd(r(2, (N, nx, nx)), nx)
    Quu = spd(r(3, (N, nu, nu)), nu)
    Qxu = 0.1 * r(4, (N, nx, nu))
    fields = dict(
        A=A, B=B, xres=r(5, (N, nx)), Qxx=Qxx, Qxu=Qxu, Quu=Quu,
        lx=r(6, (N, nx)), lu=r(7, (N, nu)),
        Qxx_N=spd(r(8, (nx, nx)), nx), lx_N=r(9, (nx,)))
    if nf > 0:
        sw_rows = (jax.random.uniform(ks[10], (N, nf)) < 0.3).astype(dtype)
        # only some stages constrained
        stage_on = (jax.random.uniform(ks[11], (N, 1)) < 0.3).astype(dtype)
        sw = sw_rows * stage_on
        fields.update(
            Phix=r(12, (N, nf, nx)) * sw[:, :, None],
            Phiu=r(13, (N, nf, nu)) * sw[:, :, None],
            Pc=r(14, (N, nf)) * sw, sw=sw)
    else:
        fields.update(Phix=None, Phiu=None, Pc=None, sw=None)
    return LQRData(**fields)


@pytest.mark.parametrize("nf", [0, 3])
def test_matches_serial_scan(nf):
    # nf < nu: a stage with every switching row active must keep the
    # Schur block S = Phiu G^-1 Phiu^T nonsingular (rank <= nu)
    N, nx, nu = 9, 8, 4
    data = _random_data(jax.random.PRNGKey(0), N, nx, nu, nf)
    dx0 = jnp.ones(nx, jnp.float64) * 0.1
    dx_r, du_r, dl_r, pol_r = jax.jit(lqr.solve)(data, dx0)
    dx_p, du_p, dl_p, pol_p = jax.jit(pallas_scan.solve)(data, dx0)
    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_r),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(du_p), np.asarray(du_r),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(dl_p), np.asarray(dl_r),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(pol_p.P), np.asarray(pol_r.P),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(pol_p.K), np.asarray(pol_r.K),
                               rtol=1e-9, atol=1e-10)
    if nf > 0:
        np.testing.assert_allclose(np.asarray(pol_p.Mx),
                                   np.asarray(pol_r.Mx),
                                   rtol=1e-9, atol=1e-10)
        np.testing.assert_allclose(np.asarray(pol_p.mx),
                                   np.asarray(pol_r.mx),
                                   rtol=1e-9, atol=1e-10)


def test_matches_under_vmap():
    N, nx, nu, nf, Bb = 7, 6, 5, 4, 5
    keys = jax.random.split(jax.random.PRNGKey(1), Bb)
    datas = jax.vmap(
        lambda k: _random_data(k, N, nx, nu, nf))(keys)
    dx0 = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (Bb, nx),
                                  jnp.float64)
    ref = jax.jit(jax.vmap(lqr.solve))(datas, dx0)
    pal = jax.jit(jax.vmap(pallas_scan.solve))(datas, dx0)
    for a, b in zip(ref[:3], pal[:3]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-9, atol=1e-10)
