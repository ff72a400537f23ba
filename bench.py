"""Benchmark entry point (driver-run, real TPU).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Current metric (round 1 interim, upgraded to ANYmal trot MPC as the contact
pipeline lands): scenario-batched MPC-style solver updates/s on the iiwa14
config-space OCP (T=1, N=20, joint limits PDIPM), f32, max_iter=2 per update
— the reference's MPC cadence (examples/a1/mpc/trot.py: max_iter=2, 2.5 ms
budget => 400 updates/s/core). vs_baseline = aggregate updates/s / 400.
"""
import json
import math
import os
import time

import jax
import jax.numpy as jnp

# Persistent compilation cache: TPU first-compiles go through a slow
# remote-compile path in this environment; cache them across runs.
os.makedirs(os.path.expanduser("~/.cache/robotoc_tpu_xla"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/robotoc_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from robotoc_tpu.constraints.joint_limits import make_joint_limits
    from robotoc_tpu.costs.config_cost import make_config_cost
    from robotoc_tpu.models import load_robot
    from robotoc_tpu.solver import unconstr_ocp_solver as S
    from robotoc_tpu.solver.unconstr_ocp_solver import UnconstrOCPSolver

    dtype = jnp.float32
    m = load_robot("iiwa14", dtype=dtype)
    cost = make_config_cost(
        m, q_ref=jnp.asarray([0, math.pi / 2, 0, math.pi / 2, 0,
                              math.pi / 2, 0], dtype),
        q_weight=10, v_weight=0.01, a_weight=0.01,
        q_weight_terminal=10, v_weight_terminal=0.01)
    lim = make_joint_limits(m, u_limit=jnp.full(7, 50.0, dtype),
                            v_limit=jnp.full(7, math.pi / 2, dtype))
    solver = UnconstrOCPSolver(m, cost, lim, T=1.0, N=20)
    q0 = jnp.asarray([math.pi / 2, 0, math.pi / 2, 0, math.pi / 2, 0,
                      math.pi / 2], dtype)
    v0 = jnp.zeros(7, dtype)

    B = 256  # scenario batch
    sol0 = solver.init_solution(q0, v0)
    sols = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), sol0)
    key = jax.random.PRNGKey(0)
    q0s = q0 + 0.1 * jax.random.normal(key, (B, 7), dtype)
    v0s = jnp.zeros((B, 7), dtype)

    def mpc_update(sol, q0, v0):
        # max_iter=2 Newton updates (reference MPC cadence)
        for _ in range(2):
            sol, kkt, alpha, _ = S._update(
                solver.model, solver.cost, solver.limits, solver.dt,
                solver.options.barrier,
                solver.options.fraction_to_boundary_rule, sol, q0, v0)
        return sol, kkt

    step = jax.jit(jax.vmap(mpc_update))
    sols, kkt = step(sols, q0s, v0s)
    jax.block_until_ready(kkt)

    n_rep = 20
    t0 = time.perf_counter()
    for _ in range(n_rep):
        sols, kkt = step(sols, q0s, v0s)
    jax.block_until_ready(kkt)
    dt_s = (time.perf_counter() - t0) / n_rep
    updates_per_s = B / dt_s
    print(json.dumps({
        "metric": "iiwa14 N=20 MPC updates/s (B=256 scenarios, "
                  "max_iter=2, f32)",
        "value": round(updates_per_s, 1),
        "unit": "updates/s",
        "vs_baseline": round(updates_per_s / 400.0, 2),
    }))


if __name__ == "__main__":
    main()
