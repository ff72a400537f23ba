"""Riccati backend benchmark: serial scan vs associative-scan (parallel).

Round-1 review item #4: measure both backends on the real TPU at
N in {20, 50, 100, 250} (f32), batched and unbatched, check f32 accuracy
against the f64 serial scan, and report which backend wins where. The
OCPSolver default (SolverOptions.parallel_riccati) follows these numbers.

Usage: python tools/bench_riccati.py [--cpu]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--batch", type=int, default=128)
parser.add_argument("--long", action="store_true",
                    help="round-3 review item #7: the small-batch "
                         "long-horizon regime (B in {1, 8}, N in "
                         "{64, 256, 1024}) where the O(log N) "
                         "associative scan should win")
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
os.makedirs(os.path.expanduser("~/.cache/robotoc_tpu_xla"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/robotoc_tpu_xla"))
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp

from robotoc_tpu.core.structs import LQRData
from robotoc_tpu.riccati import lqr, parallel


def random_lqr(key, N, nx=36, nu=12, dtype=jnp.float32):
    ks = jax.random.split(key, 12)
    A = (0.95 * jnp.eye(nx, dtype=dtype)
         + 0.05 * jax.random.normal(ks[0], (N, nx, nx), dtype))
    B = jax.random.normal(ks[1], (N, nx, nu), dtype)
    xres = 0.1 * jax.random.normal(ks[2], (N, nx), dtype)
    W = jax.random.normal(ks[3], (N, nx, nx), dtype)
    Qxx = W @ jnp.swapaxes(W, -1, -2) / nx + 0.1 * jnp.eye(nx, dtype=dtype)
    Wu = jax.random.normal(ks[4], (N, nu, nu), dtype)
    Quu = Wu @ jnp.swapaxes(Wu, -1, -2) / nu + 1.0 * jnp.eye(nu, dtype=dtype)
    Qxu = 0.05 * jax.random.normal(ks[5], (N, nx, nu), dtype)
    lx = jax.random.normal(ks[6], (N, nx), dtype)
    lu = jax.random.normal(ks[7], (N, nu), dtype)
    WN = jax.random.normal(ks[8], (nx, nx), dtype)
    QxxN = WN @ WN.T / nx + 0.1 * jnp.eye(nx, dtype=dtype)
    lxN = jax.random.normal(ks[9], (nx,), dtype)
    dx0 = jax.random.normal(ks[10], (nx,), dtype)
    return LQRData(A=A, B=B, xres=xres, Qxx=Qxx, Qxu=Qxu, Quu=Quu,
                   lx=lx, lu=lu, Qxx_N=QxxN, lx_N=lxN), dx0


def timeit(fn, *a, n=30):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    B = args.batch
    Ns = (64, 256, 1024) if args.long else (20, 50, 100, 250)
    if args.long:
        B = 8
    results = []
    for N in Ns:
        data, dx0 = random_lqr(jax.random.PRNGKey(N), N)
        # f64 oracle for accuracy
        data64 = jax.tree.map(lambda x: jnp.asarray(x, jnp.float64), data)
        dx0_64 = jnp.asarray(dx0, jnp.float64)
        dx_ref = np.asarray(lqr.solve(data64, dx0_64)[0])

        serial = jax.jit(lambda d, x0: lqr.solve(d, x0)[0])
        par = jax.jit(lambda d, x0: parallel.solve(d, x0)[0])
        err_s = float(np.max(np.abs(np.asarray(serial(data, dx0))
                                    - dx_ref)))
        err_p = float(np.max(np.abs(np.asarray(par(data, dx0)) - dx_ref)))
        t_s = timeit(serial, data, dx0)
        t_p = timeit(par, data, dx0)

        # batched (the MPC-fleet regime): vmap over B problems
        datab = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), data)
        dx0b = jnp.broadcast_to(dx0, (B,) + dx0.shape)
        serial_b = jax.jit(jax.vmap(lambda d, x0: lqr.solve(d, x0)[0]))
        par_b = jax.jit(jax.vmap(lambda d, x0: parallel.solve(d, x0)[0]))
        t_sb = timeit(serial_b, datab, dx0b, n=10)
        t_pb = timeit(par_b, datab, dx0b, n=10)
        row = dict(N=N, serial_ms=round(t_s * 1e3, 3),
                   parallel_ms=round(t_p * 1e3, 3),
                   serial_batched_ms=round(t_sb * 1e3, 3),
                   parallel_batched_ms=round(t_pb * 1e3, 3),
                   f32_err_serial=err_s, f32_err_parallel=err_p,
                   speedup_unbatched=round(t_s / t_p, 2),
                   speedup_batched=round(t_sb / t_pb, 2))
        results.append(row)
        print(json.dumps(row), flush=True)
    wins = [r for r in results if r["speedup_unbatched"] > 1.0]
    print(f"# parallel wins unbatched at N = "
          f"{[r['N'] for r in wins]} (batched regime: "
          f"{[r['N'] for r in results if r['speedup_batched'] > 1.0]})")


if __name__ == "__main__":
    main()
