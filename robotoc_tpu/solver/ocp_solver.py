"""OCPSolver: whole-body optimal control with contacts and a floating base.

TPU-native counterpart of the reference's flagship solver
(reference: include/robotoc/solver/ocp_solver.hpp:41,
src/solver/ocp_solver.cpp:10-493). One Newton update = one XLA computation:
batched stage evaluation+condensing (vmap over grids), scan-Riccati, batched
expansion, fraction-to-boundary, manifold update. The contact schedule enters
as per-grid ARRAYS (planner/contact_sequence.py) so MPC re-discretization
never recompiles.

v1 scope: grid-based discretization, intermediate+terminal stages (impact
stages land next), joint limits + friction cones, fixed barrier parameter.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..constraints import friction_cone as fc
from ..constraints import joint_limits as jl
from ..constraints import pdipm
from ..core.structs import LQRData
from ..costs import base as cost_base
from ..models import contacts as ct
from ..models import robot as rm
from ..ocp import contact_stage as stage
from ..ocp import impact_stage as istage
from ..planner.contact_sequence import GridData
from ..riccati import lqr
from ..riccati import parallel as plqr
from ..riccati import pallas_scan as plscan


@struct.dataclass
class Solution:
    """Horizon-stacked primal-dual iterate for the contact OCP
    (reference core/split_solution.hpp:87-169, stacked)."""
    q: jnp.ndarray        # (N+1, nq)
    v: jnp.ndarray        # (N+1, nv)
    a: jnp.ndarray        # (N+1, nv)
    u: jnp.ndarray        # (N+1, dimu)
    f: jnp.ndarray        # (N+1, nf)
    lmd: jnp.ndarray      # (N+1, nv)
    gmm: jnp.ndarray      # (N+1, nv)
    beta: jnp.ndarray     # (N+1, nv)
    mu: jnp.ndarray       # (N+1, nf)
    s_lim: jnp.ndarray    # (N, 6*dimu)
    z_lim: jnp.ndarray
    s_cone: jnp.ndarray   # (N, 5*nc)
    z_cone: jnp.ndarray
    xi: jnp.ndarray       # (N+1, nf) switching-constraint multipliers
    # (reference split_solution.hpp xi_stack), stored at the constrained
    # grid (two slots before the impact slot)


@struct.dataclass
class SolverOptions:
    max_iter: int = struct.field(pytree_node=False, default=100)
    kkt_tol: float = struct.field(pytree_node=False, default=1e-7)
    barrier: float = struct.field(pytree_node=False, default=1e-3)
    """Initial barrier parameter mu_init
    (reference solver_options.hpp:38-40)."""
    mu_min: float = struct.field(pytree_node=False, default=1e-3)
    """Minimum barrier parameter; the default equals `barrier`, i.e. no
    path-following (reference solver_options.hpp:42-46)."""
    kkt_tol_mu: float = struct.field(pytree_node=False, default=1e-7)
    """Perturbed-KKT tolerance that triggers a barrier decrease
    (reference solver_options.hpp:48-52)."""
    mu_linear_decrease_factor: float = struct.field(
        pytree_node=False, default=0.2)
    mu_superlinear_decrease_power: float = struct.field(
        pytree_node=False, default=1.5)
    """mu' = max(mu_min, min(mu * linear_factor, mu ** superlinear_power))
    (reference solver_options.hpp:54-65)."""
    fraction_to_boundary_rule: float = struct.field(
        pytree_node=False, default=0.995)
    parallel_riccati: bool = struct.field(pytree_node=False, default=False)
    """Use the O(log N)-depth associative-scan Riccati
    (riccati/parallel.py) instead of the serial scan. Measured regime
    (BENCH_NOTES round-4, v5e f32, nx=36/nu=12): wins ONLY unbatched
    (B=1), 1.06-1.27x growing with N (e.g. N=1024: 35.6 -> 28.0 ms);
    loses 4-7x whenever a scenario batch is vmapped over it, so the
    serial scan / Pallas sweep stay the fleet defaults. In f32 the
    null-space element transform is also less robust on stiff contact
    problems (one perturbed trot scenario in 16 diverges under full
    steps). Prefer riccati/partitioned.py for long horizons across
    chips."""
    enable_line_search: bool = struct.field(pytree_node=False, default=False)
    """Merit-backtracking line search (reference line_search/)."""
    switching_constraints: bool = struct.field(
        pytree_node=False, default=False)
    """Impose the pure-state switching constraint (next impact's contact
    placement at the predicted configuration) two grids before each impact
    slot, with the constrained Riccati factorization
    (reference switching_constraint.cpp + riccati_factorizer.cpp:58-89).
    Only effective when n_reserved_events > 0."""
    use_pallas: str = struct.field(pytree_node=False, default="auto")
    """Per-stage condensing backend: "auto" = Pallas kernels
    (ops/pallas_condense) on TPU, vmapped JAX on CPU; True / False force
    it. The Pallas path keeps each 128-stage tile VMEM-resident instead
    of streaming every tiny batched matmul through HBM."""
    use_pallas_chain: str = struct.field(pytree_node=False, default="auto")
    """Fused Pallas kinematic-chain kernel (ops/pallas_chain) for the
    stage derivatives. "auto" follows use_pallas; False forces the XLA
    jacfwd chain even when the condense/Riccati Pallas kernels are on
    (round-3 lesson: an unverified chain kernel in the default TPU path
    broke every OCPSolver user on the driver toolchain)."""


class OCPSolver:
    def __init__(self, model: rm.RobotModel, contacts: ct.ContactModel,
                 costs,
                 limits: Optional[jl.JointLimits], T: float, N: int,
                 options: SolverOptions = SolverOptions(),
                 n_reserved_events: int = 0):
        self.model = model
        self.contacts = contacts
        self.costs = tuple(costs) if isinstance(
            costs, (tuple, list)) else (costs,)
        self.limits = limits if limits is not None \
            else jl.make_joint_limits(model)
        self.T, self.N = float(T), int(N)
        self.n_reserved_events = int(n_reserved_events)
        self.n_slots = self.N + 1 + self.n_reserved_events
        self.options = options
        n_imp = self.n_reserved_events
        enable_sw = bool(options.switching_constraints) and n_imp > 0
        # both Riccati backends support the switching constraint: the
        # serial scan via the constrained Schur branch (riccati/lqr.py),
        # the associative scan via the exact null-space element transform
        # (riccati/parallel.py _null_space_transform)
        use_pallas = options.use_pallas
        if use_pallas == "auto":
            use_pallas = (jax.default_backend() != "cpu"
                          and contacts.max_dimf > 0)
        self.use_pallas = bool(use_pallas)
        use_chain = options.use_pallas_chain
        if use_chain == "auto":
            use_chain = self.use_pallas
        from ..ops import pallas_chain as _pchain
        self.use_chain = (bool(use_chain) and self.use_pallas
                          and _pchain.chain_supported(model, contacts))
        if options.parallel_riccati:
            global_lqr = plqr
        elif self.use_pallas:
            global_lqr = plscan   # grid-as-time Pallas backward sweep
        else:
            global_lqr = lqr
        self._lqr = global_lqr
        # `costs` is a call-time pytree argument: the MPC layer swaps
        # reference arrays every update without recompiling.
        self._solve = jax.jit(functools.partial(
            _solve, model, contacts, self.limits,
            options.max_iter, options.kkt_tol, options.barrier,
            options.fraction_to_boundary_rule, n_imp,
            riccati=global_lqr,
            enable_ls=options.enable_line_search, enable_sw=enable_sw,
            use_pallas=self.use_pallas, use_chain=self.use_chain))
        # barrier-schedule variant: (kkt_tol, barrier) are call-time traced
        # scalars so the mu path-following outer loop never recompiles
        self._solve_mu = jax.jit(functools.partial(
            _solve, model, contacts, self.limits, options.max_iter,
            ftb=options.fraction_to_boundary_rule, n_imp=n_imp,
            riccati=global_lqr,
            enable_ls=options.enable_line_search, enable_sw=enable_sw,
            use_pallas=self.use_pallas, use_chain=self.use_chain))
        self._update = jax.jit(functools.partial(
            _update, model, contacts, self.limits,
            options.barrier, options.fraction_to_boundary_rule, n_imp,
            riccati=global_lqr,
            enable_ls=options.enable_line_search, enable_sw=enable_sw,
            use_pallas=self.use_pallas, use_chain=self.use_chain))
        self._kkt_error = jax.jit(functools.partial(
            _kkt_error, model, contacts, self.limits,
            options.barrier, n_imp, enable_sw=enable_sw,
            use_pallas=self.use_pallas, use_chain=self.use_chain))

    def init_solution(self, grid: GridData, q, v,
                      f_init: Optional[jnp.ndarray] = None) -> Solution:
        """Warm start: constant (q, v), forces distributing the weight over
        active contacts (reference mpc_* init pattern)."""
        return make_initial_solution(self.model, self.contacts, self.limits,
                                     self.options.barrier, grid, q, v,
                                     f_init)

    def solve(self, grid: GridData, q_init, v_init,
              sol: Optional[Solution] = None, costs=None,
              statistics: bool = False):
        """Full Newton solve. When options.mu_min < options.barrier, runs
        barrier path-following: solve the perturbed KKT system to
        kkt_tol_mu at each mu, decrease mu (linear/superlinear, reference
        solver_options.hpp:38-65), re-initialize the PDIPM pairs at the
        new mu, and finish at mu_min with kkt_tol. With the default
        mu_min == barrier this is a single fixed-barrier solve.

        statistics=True additionally returns a populated SolverStatistics
        (per-iteration KKT/step-size history, barrier path, wall time)."""
        import time as _time
        from .statistics import SolverStatistics
        if sol is None:
            sol = self.init_solution(grid, q_init, v_init)
        q_init = jnp.asarray(q_init, self.model.dtype)
        v_init = jnp.asarray(v_init, self.model.dtype)
        costs = costs or self.costs
        o = self.options
        t0 = _time.perf_counter()
        if o.mu_min >= o.barrier and not statistics:
            return self._solve(costs, sol, grid, q_init, v_init)
        stats = SolverStatistics()
        mu = float(o.barrier)
        total_iters = 0
        while True:
            last = mu <= o.mu_min * (1.0 + 1e-12)
            tol = o.kkt_tol if last else max(o.kkt_tol_mu, o.kkt_tol)
            sol, st = self._solve_mu(
                jnp.asarray(tol, self.model.dtype),
                jnp.asarray(mu, self.model.dtype),
                costs=costs, sol=sol, grid=grid,
                q_init=q_init, v_init=v_init)
            total_iters += int(st["iterations"])
            stats.kkt_error.extend(
                [float(k) for k in st["kkt_history"]
                 [:int(st["iterations"])]])
            stats.primal_step_size.extend(
                [float(a) for a in st["step_size_history"]
                 [:int(st["iterations"])]])
            stats.barrier.append(mu)
            if last or bool(st["numerical_failure"]):
                break
            mu = max(o.mu_min, min(mu * o.mu_linear_decrease_factor,
                                   mu ** o.mu_superlinear_decrease_power))
            sol = reinit_constraints(self.model, self.contacts,
                                     self.limits, mu, grid, sol)
        stats.convergence = bool(st["convergence"])
        stats.iter = total_iters
        stats.cpu_time = (_time.perf_counter() - t0) * 1e3
        st = dict(st)
        st["iterations"] = total_iters
        if statistics:
            return sol, st, stats
        return sol, st

    def update(self, grid: GridData, q_init, v_init, sol: Solution,
               costs=None):
        """One Newton update (MPC mode)."""
        return self._update(costs or self.costs, sol, grid,
                            jnp.asarray(q_init), jnp.asarray(v_init))

    def kkt_error(self, grid: GridData, q_init, v_init, sol: Solution,
                  costs=None):
        return float(self._kkt_error(costs or self.costs, sol, grid,
                                     jnp.asarray(q_init),
                                     jnp.asarray(v_init)))

    # -- solution access by name (reference ocp_solver.cpp:245-411) ------

    def get_solution(self, sol: Solution, name: str,
                     grid: Optional[GridData] = None):
        """Horizon-stacked solution component by name
        (reference OCPSolver::getSolution, ocp_solver.cpp:245-323).
        Names: q, v, a, u, f, lmd, gmm, beta, mu, xi, and "f_WORLD"
        (local contact forces rotated to the world frame per grid).
        For "f_WORLD", pass `grid` to zero inactive (swing) contacts and
        impact/terminal slots as the reference does
        (ocp_solver.cpp:280-295); without it the raw iterate is rotated.
        Surface contacts rotate both the linear and angular wrench
        halves."""
        if name == "f_WORLD":
            ct_ = self.contacts
            m = self.model

            def world(qk, fk):
                Rw, pw = rm.forward_kinematics(m, qk)
                outs = []
                for c in range(ct_.n_contacts):
                    off = ct_.f_offsets[c]
                    Rc, _ = rm.frame_placement(m, ct_.frame_ids[c],
                                               Rw, pw)
                    outs.append(Rc @ fk[off:off + 3])
                    if ct_.types[c] == 6:
                        outs.append(Rc @ fk[off + 3:off + 6])
                return jnp.concatenate(outs)

            fw = jax.vmap(world)(sol.q, sol.f)
            if grid is not None:
                fmask = jax.vmap(ct_.force_mask)(grid.contact_mask)
                slot = (1.0 - grid.is_impact).at[-1].set(0.0)
                fw = fw * fmask * slot[:, None]
            return fw
        if not hasattr(sol, name):
            raise ValueError(f"unknown solution component {name!r}")
        return getattr(sol, name)

    def set_solution(self, sol: Solution, name: str, value) -> Solution:
        """Warm-start a component by name (reference
        OCPSolver::setSolution, ocp_solver.cpp:341-411): `value` is
        either one grid's vector (broadcast across the horizon) or a
        full (n_slots, dim) array."""
        if not hasattr(sol, name):
            raise ValueError(f"unknown solution component {name!r}")
        cur = getattr(sol, name)
        value = jnp.asarray(value, cur.dtype)
        if value.ndim == cur.ndim - 1:
            value = jnp.broadcast_to(value, cur.shape)
        if value.shape != cur.shape:
            raise ValueError(
                f"shape {value.shape} does not broadcast to {cur.shape}")
        return sol.replace(**{name: value})


# ---------------------------------------------------------------------------

def make_initial_solution(model, contacts, limits, barrier,
                          grid: GridData, q, v,
                          f_init: Optional[jnp.ndarray] = None) -> Solution:
    """Constant-(q, v) warm start; stance forces share the robot's weight;
    PDIPM slacks/duals initialized strictly feasible
    (reference: initConstraints / mpc_* init pattern)."""
    m = model
    n1 = grid.n_slots
    nf = contacts.max_dimf
    dtype = m.dtype
    q = jnp.broadcast_to(jnp.asarray(q, dtype), (n1, m.nq))
    v = jnp.broadcast_to(jnp.asarray(v, dtype), (n1, m.nv))
    znv = jnp.zeros((n1, m.nv), dtype)
    if f_init is None:
        # distribute weight: mg / n_active on each active contact (z)
        n_active = jnp.maximum(jnp.sum(grid.contact_mask, axis=1), 1.0)
        fz = m.total_mass * 9.81 / n_active
        f_init = jnp.zeros((n1, nf), dtype)
        offs = contacts.f_offsets
        for c in range(contacts.n_contacts):
            f_init = f_init.at[:, offs[c] + 2].set(
                fz * grid.contact_mask[:, c])
    sol = Solution(q=q, v=v, a=znv, u=jnp.zeros((n1, m.dimu), dtype),
                   f=f_init, lmd=znv, gmm=znv, beta=znv,
                   mu=jnp.zeros((n1, nf), dtype),
                   s_lim=jnp.zeros((n1 - 1, 0), dtype),
                   z_lim=jnp.zeros((n1 - 1, 0), dtype),
                   s_cone=jnp.zeros((n1 - 1, 0), dtype),
                   z_cone=jnp.zeros((n1 - 1, 0), dtype),
                   xi=jnp.zeros((n1, nf), dtype))
    return reinit_constraints(model, contacts, limits, barrier, grid, sol)


def reinit_constraints(model, contacts, limits, barrier, grid: GridData,
                       sol: Solution) -> Solution:
    """(Re-)initialize the PDIPM slack/dual variables from the current
    primal iterate (reference dms_.initConstraints, called at solver init
    and after every mesh refinement, ocp_solver.cpp:164,196)."""
    m = model
    e_lim = jl.constraint_values(m, limits, sol.q[:-1], sol.v[:-1],
                                 sol.u[:-1], sol.a[:-1])
    s_lim, z_lim = pdipm.init_slack_dual(e_lim, barrier, limits.mask)
    cone_mask = jax.vmap(contacts.cone_mask)(grid.contact_mask[:-1]) > 0
    f_mask = jax.vmap(contacts.force_mask)(grid.contact_mask[:-1])
    g_cone = jax.vmap(
        lambda qq, ff, fr: fc.residual_and_jac(
            m, contacts, qq, ff, fr)[0])(
        sol.q[:-1], sol.f[:-1] * f_mask,
        grid.friction[:-1])
    s_cone, z_cone = pdipm.init_slack_dual(g_cone, barrier, cone_mask)
    return sol.replace(s_lim=s_lim, z_lim=z_lim, s_cone=s_cone,
                       z_cone=z_cone)


def _impact_slots(grid: GridData, n_imp: int):
    """Indices of the impact/pass-through slots. The grid builders
    (planner/contact_sequence.discretize, sto/discretization) guarantee
    EXACTLY n_imp slots with is_impact == 1 among the stage slots, so the
    static-size nonzero never pads with duplicate indices."""
    return jnp.nonzero(grid.is_impact[:-1], size=n_imp)[0]


def _build(model, contacts, limits, barrier, n_imp,
           costs, sol: Solution, grid: GridData, q_init, v_init,
           enable_sw=False, use_pallas=False, use_chain=False):
    """n_imp (static int): number of impact/pass-through slots in the grid.
    Impact stages are evaluated ONLY on those slots (gather -> scatter), not
    on all N grids — the reserved-slot design's FLOP saving (round-1 review
    item: the dual full-horizon evaluation did ~2x redundant work).
    enable_sw: assemble the switching constraints (condensed rows Phix/Phiu
    attached two slots before each impact slot).
    use_pallas: run the per-stage condensing through the batched Pallas
    kernels (ops/pallas_condense) instead of the vmapped JAX path — both
    stage types merge at the PRE level and condense in one kernel call."""
    dt = grid.dt
    nv, nu_dim = model.nv, model.dimu
    nf = contacts.max_dimf
    pre_fn = functools.partial(
        stage.stage_pre, model, contacts, costs, limits)
    pre_args = (grid.t[:-1], dt, jnp.full_like(dt, barrier),
                sol.q[:-1], sol.v[:-1], sol.a[:-1], sol.u[:-1],
                sol.f[:-1], sol.beta[:-1], sol.mu[:-1], sol.lmd[:-1],
                sol.gmm[:-1], sol.lmd[1:], sol.gmm[1:], sol.q[1:],
                sol.v[1:], sol.s_lim, sol.z_lim, sol.s_cone, sol.z_cone,
                grid.contact_mask[:-1], grid.p_ref[:-1],
                grid.friction[:-1], grid.R_ref[:-1])
    from ..ops import pallas_chain as pchain
    if use_chain and use_pallas and pchain.chain_supported(model, contacts):
        # fused chain kernel for ALL intermediate grids in one call
        # (the custom-vmap flattens the fleet batch into the lane axis);
        # gait cost stacks quadratize IN-KERNEL too (round-5)
        rowmask = jax.vmap(contacts.force_mask)(grid.contact_mask[:-1])
        with_cost = pchain.cost_fold_supported(model, costs, contacts)
        cost_ins = (pchain.cost_fold_inputs(model, contacts, costs, grid,
                                            sol) if with_cost else ())
        chain_out = pchain.get_chain(model, contacts,
                                     with_cost=with_cost)(
            sol.q[:-1], sol.v[:-1], sol.a[:-1], sol.f[:-1] * rowmask,
            grid.friction[:-1], grid.p_ref[:-1], grid.R_ref[:-1],
            *cost_ins)
        pre = jax.vmap(lambda co, *a: pre_fn(*a, chain_out=co))(
            chain_out, *pre_args)
    else:
        pre = jax.vmap(pre_fn)(*pre_args)
    if n_imp > 0:
        idx = _impact_slots(grid, n_imp)
        g = lambda x: jnp.take(x, idx, axis=0)
        ifn = jax.vmap(functools.partial(
            istage.stage_pre, model, contacts, costs, limits))
        ipre = ifn(g(grid.t[:-1]), g(dt),
                   jnp.full((n_imp,), barrier, dt.dtype),
                   g(sol.q[:-1]), g(sol.v[:-1]), g(sol.a[:-1]),
                   g(sol.u[:-1]), g(sol.f[:-1]), g(sol.beta[:-1]),
                   g(sol.mu[:-1]), g(sol.lmd[:-1]), g(sol.gmm[:-1]),
                   g(sol.lmd[1:]), g(sol.gmm[1:]),
                   g(sol.q[1:]), g(sol.v[1:]),
                   g(sol.s_lim), g(sol.z_lim), g(sol.s_cone),
                   g(sol.z_cone),
                   g(grid.imp_mask[:-1]), g(grid.p_ref[:-1]),
                   g(grid.friction[:-1]))
        pre = {k: pre[k].at[idx].set(ipre[k]) for k in pre}
    kin = {k: v for k, v in pre.items() if not k.startswith("aux_")}
    if use_pallas:
        from ..ops import pallas_condense as pc
        ko = pc.get_condense(nv, nu_dim, nf, contacts.dimc_cone)(**kin)
    else:
        ko = jax.vmap(
            functools.partial(stage.condense_jax, nv, nu_dim, nf))(kin)
    blocks = jax.vmap(
        functools.partial(stage.stage_finish, nv, nu_dim, nf))(pre, ko)
    sw_fields = dict(Phix=None, Phiu=None, Pc=None, sw=None)
    sw_aux = dict(lagrangian=jnp.zeros((), sol.q.dtype))
    if n_imp > 0 and enable_sw:
        from ..dynamics import switching_constraint as swc
        nv, nu_dim = model.nv, model.dimu
        nf = contacts.max_dimf
        S1 = grid.n_slots - 1
        idx = _impact_slots(grid, n_imp)
        idx_sw = jnp.maximum(idx - 2, 0)
        # valid: the two slots before the impact slot must be intermediate
        imp_flag = grid.is_impact[:-1]
        valid = ((idx >= 2)
                 & (jnp.take(imp_flag, jnp.maximum(idx - 1, 0)) == 0)
                 & (jnp.take(imp_flag, idx_sw) == 0))
        sw_cmask = jnp.take(grid.imp_mask, idx, axis=0) \
            * valid[:, None].astype(sol.q.dtype)
        g = lambda x: jnp.take(x, idx_sw, axis=0)
        fn_sw = jax.vmap(functools.partial(
            swc.residual_and_jacs, model, contacts))
        P_res, Phiq, Phiv, Phia = fn_sw(
            g(sol.q[:-1]), g(sol.v[:-1]), g(sol.a[:-1]),
            jnp.take(grid.dt, idx_sw), jnp.take(grid.dt,
                                                jnp.maximum(idx - 1, 0)),
            jnp.take(grid.p_ref, idx, axis=0),
            jnp.take(grid.R_ref, idx, axis=0), sw_cmask)
        G_g = jnp.take(blocks.G, idx_sw, axis=0)
        c0_g = jnp.take(blocks.c0, idx_sw, axis=0)
        Phix, Phiu, Pc = jax.vmap(
            lambda pr, pq, pv, pa, gg, cc: swc.condense(
                pr, pq, pv, pa, gg[:nv], cc[:nv], nv, nu_dim))(
            P_res, Phiq, Phiv, Phia, G_g, c0_g)
        rowmask = jax.vmap(contacts.force_mask)(sw_cmask)
        xi_g = jnp.take(sol.xi, idx_sw, axis=0) * rowmask
        # Lagrangian-gradient corrections on the condensed rows (exact:
        # Phia^T xi rides the contact-dynamics condensation inside Phix/Phiu)
        blocks = blocks._replace(
            lx=blocks.lx.at[idx_sw].add(
                jnp.einsum("kfx,kf->kx", Phix, xi_g)),
            lu=blocks.lu.at[idx_sw].add(
                jnp.einsum("kfu,kf->ku", Phiu, xi_g)))
        # exact full-space KKT correction at the constrained slots,
        # REBUILT as kkt_rest + corrected squares — a pure sum of squares
        # (the old difference-of-squares delta could push the total
        # negative in floating point, forcing a max(..., 0) floor that
        # made "kkt = 0.000e+00" reportable; round-3 review Weak #3)
        lq_g = g(blocks.lq_full) + jnp.einsum("kfq,kf->kq", Phiq, xi_g)
        lv_g = g(blocks.lv_full) + jnp.einsum("kfq,kf->kq", Phiv, xi_g)
        la_g = g(blocks.la_full) + jnp.einsum("kfq,kf->kq", Phia, xi_g)
        slot_sq = (jnp.take(blocks.kkt_rest, idx_sw)
                   + jnp.sum(lq_g**2, axis=1) + jnp.sum(lv_g**2, axis=1)
                   + jnp.sum(la_g**2, axis=1) + jnp.sum(P_res**2, axis=1))
        blocks = blocks._replace(
            kkt_sq=blocks.kkt_sq.at[idx_sw].set(slot_sq))
        zx = jnp.zeros((S1, nf, 2 * nv), sol.q.dtype)
        zu = jnp.zeros((S1, nf, nu_dim), sol.q.dtype)
        zc = jnp.zeros((S1, nf), sol.q.dtype)
        sw_fields = dict(
            Phix=zx.at[idx_sw].add(Phix * rowmask[..., None]),
            Phiu=zu.at[idx_sw].add(Phiu * rowmask[..., None]),
            Pc=zc.at[idx_sw].add(Pc * rowmask),
            sw=zc.at[idx_sw].add(rowmask))
        sw_aux = dict(lagrangian=jnp.sum(xi_g * P_res),
                      idx_sw=idx_sw, Phia=Phia)
    tq = cost_base.quadratize_terminal(costs, model, sol.q[-1],
                                       sol.v[-1], grid.t[-1])
    cN = tq.cost
    lxN = jnp.concatenate([tq.lq - sol.lmd[-1], tq.lv - sol.gmm[-1]])
    zb = jnp.zeros_like(tq.Qqq)
    QxxN = jnp.block([[tq.Qqq, zb], [zb, tq.Qvv]])
    data = LQRData(A=blocks.A, B=blocks.B, xres=blocks.xres,
                   Qxx=blocks.Qxx, Qxu=blocks.Qxu, Quu=blocks.Quu,
                   lx=blocks.lx, lu=blocks.lu, Qxx_N=QxxN, lx_N=lxN,
                   **sw_fields)
    dq0 = rm.difference(model, sol.q[0], q_init)
    dx0 = jnp.concatenate([dq0, v_init - sol.v[0]])
    # every term is a sum of squares (see the switching-slot rebuild
    # above), so the total is non-negative by construction — no floor
    kkt_sq = jnp.sum(blocks.kkt_sq) + jnp.sum(lxN**2) + jnp.sum(dx0**2)
    total_cost = jnp.sum(blocks.cost) + cN
    return data, blocks, dx0, kkt_sq, total_cost, sw_aux


class Directions(NamedTuple):
    """Full primal-dual Newton direction, expanded from the LQR solve."""
    dq_all: jnp.ndarray
    dv_all: jnp.ndarray
    da: jnp.ndarray
    du: jnp.ndarray
    df: jnp.ndarray
    dlmd: jnp.ndarray
    dgmm: jnp.ndarray
    dbeta: jnp.ndarray
    dmu: jnp.ndarray
    ds_lim: jnp.ndarray
    dz_lim: jnp.ndarray
    ds_cone: jnp.ndarray
    dz_cone: jnp.ndarray
    cone_mask: jnp.ndarray
    dxi: jnp.ndarray


def _expand_directions(model, contacts, limits, barrier, n_imp,
                       blocks, sol: Solution, grid: GridData,
                       dx, du, dlmd_all) -> Directions:
    """Recover (da, df, dbeta, dmu, slack/dual dirs) for every grid from the
    LQR directions (reference expandPrimal/expandDual, OMP loop
    direct_multiple_shooting.cpp) — one vmapped kernel. Impact expansion
    runs only on the n_imp impact slots (gather -> scatter)."""
    nv = model.nv
    dq, dv = dx[:-1, :nv], dx[:-1, nv:]
    dqN, dvN = dx[-1, :nv], dx[-1, nv:]
    dlmd, dgmm = dlmd_all[:, :nv], dlmd_all[:, nv:]
    exp = jax.vmap(functools.partial(
        stage.expand, model, contacts, limits, barrier))
    (da, df, dbeta, dmu, ds_lim, dz_lim, ds_cone, dz_cone, cone_mask) = exp(
        blocks, dq, dv, du, sol.gmm[1:] + dgmm[1:], grid.dt,
        sol.f[:-1], sol.beta[:-1], sol.mu[:-1],
        sol.s_lim, sol.z_lim, sol.s_cone, sol.z_cone,
        grid.contact_mask[:-1], grid.friction[:-1], sol.q[:-1])
    if n_imp > 0:
        idx = _impact_slots(grid, n_imp)
        g = lambda x: jnp.take(x, idx, axis=0)
        iexp = jax.vmap(functools.partial(
            istage.expand, model, contacts, barrier))
        (ida, idf, idbeta, idmu, ids_cone, idz_cone) = iexp(
            jax.tree.map(g, blocks), g(dq), g(dv),
            g(sol.gmm[1:] + dgmm[1:]),
            g(sol.f[:-1]), g(sol.beta[:-1]), g(sol.mu[:-1]),
            g(sol.s_cone), g(sol.z_cone), g(grid.imp_mask[:-1]),
            g(grid.friction[:-1]), g(sol.q[:-1]))
        da = da.at[idx].set(ida)
        df = df.at[idx].set(idf)
        dbeta = dbeta.at[idx].set(idbeta)
        dmu = dmu.at[idx].set(idmu)
        ds_cone = ds_cone.at[idx].set(ids_cone)
        dz_cone = dz_cone.at[idx].set(idz_cone)
        du = du.at[idx].set(0.0)
        ds_lim = ds_lim.at[idx].set(0.0)
        dz_lim = dz_lim.at[idx].set(0.0)
        icone = jax.vmap(contacts.cone_mask)(g(grid.imp_mask[:-1])) > 0
        cone_mask = cone_mask.at[idx].set(g(cone_mask) | icone)
    dq_all = jnp.concatenate([dq, dqN[None]], axis=0)
    dv_all = jnp.concatenate([dv, dvN[None]], axis=0)
    dxi = jnp.zeros_like(sol.xi[:-1])
    return Directions(dq_all=dq_all, dv_all=dv_all, da=da, du=du, df=df,
                      dlmd=dlmd, dgmm=dgmm, dbeta=dbeta, dmu=dmu,
                      ds_lim=ds_lim, dz_lim=dz_lim, ds_cone=ds_cone,
                      dz_cone=dz_cone, cone_mask=cone_mask, dxi=dxi)


def _step_sizes(limits, ftb, sol: Solution, d: Directions):
    """Fraction-to-boundary primal/dual step sizes."""
    a_p = jnp.minimum(
        pdipm.fraction_to_boundary(sol.s_lim, d.ds_lim, ftb, limits.mask),
        pdipm.fraction_to_boundary(sol.s_cone, d.ds_cone, ftb, d.cone_mask))
    a_d = jnp.minimum(
        pdipm.fraction_to_boundary(sol.z_lim, d.dz_lim, ftb, limits.mask),
        pdipm.fraction_to_boundary(sol.z_cone, d.dz_cone, ftb, d.cone_mask))
    return a_p, a_d


def _pad0(x):
    return jnp.concatenate(
        [x, jnp.zeros((1,) + x.shape[1:], x.dtype)], axis=0)


def _integrate_solution(model, sol: Solution, d: Directions, a_p, a_d):
    """Manifold primal update + dual update with separate step sizes
    (reference updatePrimal/updateDual)."""
    return Solution(
        q=rm.integrate(model, sol.q, a_p * d.dq_all),
        v=sol.v + a_p * d.dv_all,
        a=sol.a + a_p * _pad0(d.da),
        u=sol.u + a_p * _pad0(d.du),
        f=sol.f + a_p * _pad0(d.df),
        lmd=sol.lmd + a_p * d.dlmd,
        gmm=sol.gmm + a_p * d.dgmm,
        beta=sol.beta + a_p * _pad0(d.dbeta),
        mu=sol.mu + a_p * _pad0(d.dmu),
        s_lim=sol.s_lim + a_p * d.ds_lim,
        z_lim=sol.z_lim + a_d * d.dz_lim,
        s_cone=sol.s_cone + a_p * d.ds_cone,
        z_cone=sol.z_cone + a_d * d.dz_cone,
        xi=sol.xi + a_p * _pad0(d.dxi),
    )


def _update(model, contacts, limits, barrier, ftb, n_imp,
            costs, sol: Solution, grid: GridData, q_init, v_init,
            riccati=None, enable_ls=False, enable_sw=False,
            use_pallas=False, use_chain=False):
    if riccati is None:
        riccati = plscan if use_pallas else lqr
    built = _build(model, contacts, limits, barrier, n_imp, costs,
                   sol, grid, q_init, v_init, enable_sw=enable_sw,
                   use_pallas=use_pallas, use_chain=use_chain)
    out = _direction_and_step(model, contacts, limits, barrier, ftb,
                              n_imp, costs, sol, grid, q_init, v_init,
                              built, riccati=riccati, enable_ls=enable_ls,
                              enable_sw=enable_sw, use_pallas=use_pallas,
                              use_chain=use_chain)
    return out[:4]


def _direction_and_step(model, contacts, limits, barrier, ftb, n_imp,
                        costs, sol: Solution, grid: GridData, q_init,
                        v_init, built, riccati=None, enable_ls=False,
                        enable_sw=False, use_pallas=False, use_chain=False,
                        filt=None, ls_it=0):
    """Newton direction + globalized step from an already-evaluated build
    (lets the solve loop reuse one _build per iteration for both the step
    and the convergence check). With enable_ls == "filter", `filt` is the
    Fletcher-Leyffer filter array carried by the solve loop and the updated
    filter is returned as the 5th element."""
    if riccati is None:
        riccati = plscan if use_pallas else lqr
    data, blocks, dx0, kkt_sq, _, _ = built
    dx, du, dlmd_all, policy = riccati.solve(data, dx0)
    d = _expand_directions(model, contacts, limits, barrier, n_imp,
                           blocks, sol, grid, dx, du, dlmd_all)
    # numerical-failure guard: a non-finite direction (failed Cholesky in
    # the Riccati or the contact-space solve) zeroes the step instead of
    # poisoning the iterate (reference asserts LLT success,
    # riccati_factorizer.cpp:50,64)
    dir_ok = jnp.isfinite(jnp.asarray(
        [jnp.sum(x) for x in jax.tree.leaves(d)
         if x.dtype.kind == "f"])).all()
    if policy.Mx is not None:
        # switching multiplier DIRECTION: because the condensed gradients
        # lx/lu already carry Phix^T xi_old / Phiu^T xi_old (built in
        # _build), the constrained Riccati's multiplier Mx dx + mx is the
        # Newton DELTA on xi — same convention as the costates, whose lx
        # rows carry the current lmd/gmm.
        dxi = (jnp.einsum("kfx,kx->kf", policy.Mx, dx[:-1])
               + policy.mx) * data.sw
        d = d._replace(dxi=dxi)
        # correct the (beta, mu) dual expansion at the constrained slots:
        # the a-row stationarity there is  ga + Phia^T xi_new + M beta
        # + J^T mu = 0 — the vmapped stage expansion doesn't see the
        # switching term. By linearity of the contact-space solve, the
        # correction is one extra ty_solve with rhs (-Phia^T xi_new, 0).
        aux = built[5]
        idx_sw, Phia = aux["idx_sw"], aux["Phia"]
        g = lambda x: jnp.take(x, idx_sw, axis=0)
        xi_new = g(sol.xi[:-1]) * g(data.sw) + g(dxi)
        extra_ga = jnp.einsum("kfv,kf->kv", Phia, xi_new)
        from ..dynamics.contact_dynamics import ty_solve
        db_c, dm_c = jax.vmap(ty_solve)(
            g(blocks.inv11), g(blocks.inv12), g(blocks.Sinv),
            -extra_ga, jnp.zeros_like(xi_new))
        d = d._replace(dbeta=d.dbeta.at[idx_sw].add(db_c),
                       dmu=d.dmu.at[idx_sw].add(dm_c))
    # zero the whole direction on failure (0 * NaN would still be NaN);
    # unpack AFTER the guard so line-search trial closures see the zeroed
    # direction too (a NaN trial would otherwise poison the filter/merit)
    d = jax.tree.map(
        lambda x: jnp.where(dir_ok, x, jnp.zeros_like(x))
        if x.dtype.kind == "f" else x, d)
    (da, df, dbeta, dmu, ds_lim, dz_lim, ds_cone, dz_cone) = (
        d.da, d.df, d.dbeta, d.dmu, d.ds_lim, d.dz_lim, d.ds_cone,
        d.dz_cone)
    du = d.du
    dlmd, dgmm = d.dlmd, d.dgmm
    a_p, a_d = _step_sizes(limits, ftb, sol, d)
    a_p = jnp.where(dir_ok, a_p, 0.0)
    a_d = jnp.where(dir_ok, a_d, 0.0)
    dq_all, dv_all = d.dq_all, d.dv_all
    pad0_ls = _pad0
    if enable_ls is True or enable_ls == "merit":
        from ..line_search import line_search as ls

        def trial(alpha):
            return sol.replace(
                q=rm.integrate(model, sol.q, alpha * dq_all),
                v=sol.v + alpha * dv_all,
                a=sol.a + alpha * pad0_ls(da),
                u=sol.u + alpha * pad0_ls(du),
                f=sol.f + alpha * pad0_ls(df),
                s_lim=sol.s_lim + alpha * ds_lim,
                s_cone=sol.s_cone + alpha * ds_cone)

        rho = 1.0 + jnp.max(jnp.abs(sol.lmd)) + jnp.max(jnp.abs(sol.gmm)) \
            + jnp.max(jnp.abs(sol.beta)) + jnp.max(jnp.abs(sol.mu))

        def merit(s):
            c, v = ls.eval_ocp(model, contacts, limits, barrier, costs, s,
                               grid, q_init, v_init)
            return c + rho * v

        a_p = ls.search(trial, merit, a_p)
    if enable_ls == "filter":
        # Fletcher-Leyffer filter globalization (reference default,
        # line_search.cpp:58-84 + line_search_filter.hpp)
        from ..line_search import line_search as ls

        def trial_f(alpha):
            return sol.replace(
                q=rm.integrate(model, sol.q, alpha * dq_all),
                v=sol.v + alpha * dv_all,
                a=sol.a + alpha * pad0_ls(da),
                u=sol.u + alpha * pad0_ls(du),
                f=sol.f + alpha * pad0_ls(df),
                s_lim=sol.s_lim + alpha * ds_lim,
                s_cone=sol.s_cone + alpha * ds_cone)

        def eval_cv(s):
            return ls.eval_ocp(model, contacts, limits, barrier, costs, s,
                               grid, q_init, v_init)

        if filt is None:
            filt = ls.empty_filter(sol.q.dtype)
        a_p, c_acc, v_acc = ls.filter_search(trial_f, eval_cv, a_p, filt)
        filt = ls.filter_augment(filt, ls_it, c_acc, v_acc)
    if enable_ls == "kkt":
        # KKT-residual backtracking: accept the largest step that reduces
        # the FULL nonlinear KKT norm. More expensive per trial (one stage
        # re-evaluation) but globally monotone — needed on strongly
        # nonlinear problems (jumps) where the Gauss-Newton model (same
        # curvature drops as the reference) turns full steps into a limit
        # cycle near the solution.
        def kkt_at(ap, ad):
            trial_sol = _integrate_solution(model, sol, d, ap, ad)
            _, _, _, k_sq, _, _ = _build(model, contacts, limits, barrier,
                                         n_imp, costs, trial_sol,
                                         grid, q_init, v_init,
                                         enable_sw=enable_sw,
                                         use_pallas=use_pallas,
                                         use_chain=use_chain)
            return k_sq

        def cond(state):
            scale, k_trial, it = state
            # NaN-robust: keep backtracking unless the trial STRICTLY
            # improves (NaN comparisons are false, so a NaN trial would
            # otherwise be accepted)
            return ~(k_trial < kkt_sq) & (it < 8)

        def body(state):
            scale, _, it = state
            scale = 0.5 * scale
            return scale, kkt_at(scale * a_p, scale * a_d), it + 1

        k_full = kkt_at(a_p, a_d)
        scale, _, _ = jax.lax.while_loop(
            cond, body, (jnp.ones_like(a_p), k_full, jnp.asarray(0)))
        a_p = scale * a_p
        a_d = scale * a_d
    new = _integrate_solution(model, sol, d, a_p, a_d)
    if enable_ls == "filter":
        return new, jnp.sqrt(kkt_sq), a_p, policy, filt
    return new, jnp.sqrt(kkt_sq), a_p, policy


def _kkt_error(model, contacts, limits, barrier, n_imp,
               costs, sol, grid, q_init, v_init, enable_sw=False,
               use_pallas=False, use_chain=False):
    _, _, _, kkt_sq, _, _ = _build(model, contacts, limits, barrier,
                                   n_imp, costs, sol, grid, q_init,
                                   v_init, enable_sw=enable_sw,
                                   use_pallas=use_pallas,
                                   use_chain=use_chain)
    return jnp.sqrt(kkt_sq)


def _solve(model, contacts, limits, max_iter, kkt_tol, barrier, ftb,
           n_imp, costs, sol, grid, q_init, v_init, riccati=lqr,
           enable_ls=False, enable_sw=False, use_pallas=False,
           use_chain=False):
    """Newton loop with ONE stage build per iteration: the build evaluated
    for the convergence check is reused for the next direction (the
    reference also evaluates the KKT system once per iteration,
    ocp_solver.cpp:111-145; round-1 did it twice). Non-finite KKT (failed
    Cholesky, NaN dynamics) aborts cleanly with convergence=False instead
    of propagating NaNs (reference asserts LLT success,
    riccati_factorizer.cpp:50,64)."""

    def do_build(s):
        return _build(model, contacts, limits, barrier, n_imp, costs, s,
                      grid, q_init, v_init, enable_sw=enable_sw,
                      use_pallas=use_pallas, use_chain=use_chain)

    from ..line_search import line_search as lsmod
    use_filter = enable_ls == "filter"

    def cond(state):
        _, _, it, kkt, _, ok, _, _, _ = state
        return (it < max_iter) & (kkt > kkt_tol) & ok

    def body(state):
        s, built, it, kkt, _, ok, filt, kkt_h, alpha_h = state
        out = _direction_and_step(
            model, contacts, limits, barrier, ftb, n_imp, costs, s, grid,
            q_init, v_init, built, riccati=riccati, enable_ls=enable_ls,
            enable_sw=enable_sw, use_pallas=use_pallas,
            use_chain=use_chain, filt=filt, ls_it=it)
        new, _, alpha = out[0], out[1], out[2]
        if use_filter:
            filt = out[4]
        built_new = do_build(new)
        kkt_new = jnp.sqrt(built_new[3])
        ok_new = jnp.isfinite(kkt_new)
        # on numerical failure keep the last good iterate
        new = jax.tree.map(
            lambda a, b: jnp.where(ok_new, a, b), new, s)
        kkt_kept = jnp.where(ok_new, kkt_new, kkt)
        return (new, built_new, it + 1, kkt_kept, alpha, ok_new, filt,
                kkt_h.at[it].set(kkt_kept), alpha_h.at[it].set(alpha))

    built0 = do_build(sol)
    kkt0 = jnp.sqrt(built0[3])
    one = jnp.asarray(1.0, sol.q.dtype)
    filt0 = lsmod.empty_filter(sol.q.dtype)
    nan_h = jnp.full((max_iter,), jnp.nan, sol.q.dtype)
    sol, _, iters, kkt, alpha, ok, _, kkt_h, alpha_h = jax.lax.while_loop(
        cond, body, (sol, built0, jnp.asarray(0), kkt0, one,
                     jnp.isfinite(kkt0), filt0, nan_h, nan_h))
    return sol, dict(iterations=iters, kkt_error=kkt,
                     last_step_size=alpha,
                     convergence=(kkt <= kkt_tol) & ok,
                     numerical_failure=~ok,
                     kkt_history=kkt_h, step_size_history=alpha_h)


@functools.partial(jax.jit, static_argnames=("with_model",))
def _align_gather(model, sol: Solution, i0, i1, w, i0s, i1s,
                  with_model=True) -> Solution:
    """Device part of align_solution: gathers + one lerp (+ manifold
    interpolation for q), jitted so the per-update host cost is just the
    index computation (round-2 review item #6: the eager per-op dispatch
    here was ~300 ms per MPC update on a busy host)."""
    wf = w[:, None]
    ws = wf[:-1]

    def lin_full(x):
        return (1.0 - wf) * jnp.take(x, i0, axis=0) \
            + wf * jnp.take(x, i1, axis=0)

    def lin_stage(x):
        return (1.0 - ws) * jnp.take(x, i0s, axis=0) \
            + ws * jnp.take(x, i1s, axis=0)

    if with_model:
        q0 = jnp.take(sol.q, i0, axis=0)
        q1 = jnp.take(sol.q, i1, axis=0)
        q_new = jax.vmap(lambda a, b, t: rm.interpolate(model, a, b, t))(
            q0, q1, w)
    else:
        q_new = lin_full(sol.q)
    return Solution(
        q=q_new, v=lin_full(sol.v), a=lin_full(sol.a), u=lin_full(sol.u),
        f=lin_full(sol.f), lmd=lin_full(sol.lmd), gmm=lin_full(sol.gmm),
        beta=lin_full(sol.beta), mu=lin_full(sol.mu),
        s_lim=lin_stage(sol.s_lim), z_lim=lin_stage(sol.z_lim),
        s_cone=lin_stage(sol.s_cone), z_cone=lin_stage(sol.z_cone),
        xi=lin_full(sol.xi))


def align_solution(sol: Solution, old_grid: GridData,
                   new_grid: GridData, model=None,
                   order: str = "linear") -> Solution:
    """Warm-start re-alignment across re-discretizations
    (reference: solver/solution_interpolator.cpp:21-76, with impact-grid
    alignment at :46-52). order="linear" interpolates each new slot between
    its two bracketing old slots of the same kind — in time, with manifold
    interpolation for q when `model` is given (the reference's
    InterpolationOrder::Linear); order="zero" gathers the nearest old slot.
    Impact slots map to the nearest old impact slot. Host-side index
    computation, device gathers + one lerp."""
    import numpy as np
    t_old = np.asarray(old_grid.t)
    t_new = np.asarray(new_grid.t)
    imp_old = np.asarray(old_grid.is_impact) > 0
    imp_new = np.asarray(new_grid.is_impact) > 0
    S = t_new.shape[0]
    S_old = t_old.shape[0]
    idx0 = np.zeros(S, dtype=np.int32)
    idx1 = np.zeros(S, dtype=np.int32)
    w = np.zeros(S)
    reg_old = np.where(~imp_old)[0]
    for i in range(S):
        if imp_new[i] or order == "zero" or len(reg_old) < 2:
            same = np.where(imp_old == imp_new[i])[0]
            if len(same) == 0:
                same = np.arange(S_old)
            j = same[np.argmin(np.abs(t_old[same] - t_new[i]))]
            idx0[i] = idx1[i] = j
        else:
            j = int(np.searchsorted(t_old[reg_old], t_new[i], side="right"))
            j = min(max(j, 1), len(reg_old) - 1)
            a, b = reg_old[j - 1], reg_old[j]
            idx0[i], idx1[i] = a, b
            dtab = t_old[b] - t_old[a]
            w[i] = 0.0 if dtab <= 1e-12 else np.clip(
                (t_new[i] - t_old[a]) / dtab, 0.0, 1.0)
    return _align_gather(
        model, sol, jnp.asarray(idx0), jnp.asarray(idx1),
        jnp.asarray(w, sol.q.dtype),
        jnp.asarray(np.minimum(idx0[:-1], S_old - 2)),
        jnp.asarray(np.minimum(idx1[:-1], S_old - 2)),
        with_model=model is not None)
