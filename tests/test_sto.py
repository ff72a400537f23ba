"""STO layer: phase-based discretization + dwell-time PDIPM unit tests
(reference test/sto/ + time_discretization PhaseBased behavior), plus a
small coupled STO convergence run (slow, marked)."""
import numpy as np
import pytest

import jax.numpy as jnp

from robotoc_tpu.planner.contact_sequence import ContactSchedule
from robotoc_tpu.sto import constraints as dwell
from robotoc_tpu.sto.cost import QuadraticSTOCost, quadratize
from robotoc_tpu.sto.discretization import PhaseDiscretization, allocate_grids


def _jump_schedule(t1=0.3, t2=0.55):
    plc = np.zeros((4, 3))
    sched = ContactSchedule(nc=4).init([True] * 4, plc)
    sched.push_back([False] * 4, plc, t1, sto=True)          # lift
    sched.push_back([True] * 4, plc + [0.5, 0, 0], t2, sto=True)  # impact
    return sched


def test_allocate_grids():
    assert sum(allocate_grids([0.3, 0.25, 0.3], 12)) == 12
    assert min(allocate_grids([0.01, 0.98, 0.01], 10)) >= 1
    assert sum(allocate_grids([0.5, 0.5], 7)) == 7


def test_phase_discretization_layout():
    sched = _jump_schedule()
    disc = PhaseDiscretization(sched, 0.0, 0.85, 12)
    assert disc.P == 3 and disc.E == 2
    assert disc.event_is_impact == (False, True)
    # slots = grids + 1 impact slot + terminal
    assert disc.n_slots == 12 + 1 + 1
    ts = jnp.asarray(disc.ts0)
    g = disc.grid(ts)
    t = np.asarray(g.t)
    dt = np.asarray(g.dt)
    # exact event alignment: boundaries appear as grid times
    assert np.isclose(t[0], 0.0) and np.isclose(t[-1], 0.85)
    assert np.any(np.isclose(t, 0.3)) and np.any(np.isclose(t, 0.55))
    # uniform steps within each phase; impact slot dt == 0
    imp = np.asarray(g.is_impact)
    assert imp.sum() == 1
    k = int(np.argmax(imp))
    assert np.isclose(dt[k], 0.0) and np.isclose(t[k], 0.55)
    # contact masks: stance-flight-stance
    cm = np.asarray(g.contact_mask)
    assert cm[0].sum() == 4
    mid = int(np.argmin(np.abs(t - 0.4)))
    assert cm[mid].sum() == 0
    assert cm[-1].sum() == 4
    # newly active contacts at the impact slot
    assert np.asarray(g.imp_mask)[k].sum() == 4
    # monotone non-decreasing times, non-negative steps
    assert np.all(np.diff(t) >= -1e-12) and np.all(dt >= 0)


def test_grid_linear_in_ts():
    """t and dt must be exactly linear in ts (what makes lt autodiff exact)."""
    sched = _jump_schedule()
    disc = PhaseDiscretization(sched, 0.0, 0.85, 12)
    ts0 = jnp.asarray(disc.ts0)
    g0 = disc.grid(ts0)
    d = jnp.asarray([0.013, -0.021])
    g1 = disc.grid(ts0 + d)
    g2 = disc.grid(ts0 + 2 * d)
    assert np.allclose(np.asarray(g2.t) - np.asarray(g1.t),
                       np.asarray(g1.t) - np.asarray(g0.t), atol=1e-12)
    assert np.allclose(np.asarray(g2.dt) - np.asarray(g1.dt),
                       np.asarray(g1.dt) - np.asarray(g0.dt), atol=1e-12)


def test_refine_reallocates():
    sched = _jump_schedule()
    disc = PhaseDiscretization(sched, 0.0, 0.85, 12)
    # move the events, refine: grid counts follow the new dwell times
    ts = np.array([0.12, 0.62])
    d2 = disc.refine(ts)
    assert sum(d2.grids_per_phase) == sum(disc.grids_per_phase)
    assert d2.grids_per_phase[0] < disc.grids_per_phase[0]
    assert np.allclose(d2.ts0, ts)


def test_dwell_constraint_pdipm():
    con = dwell.make_dwell_constraint([0.1, 0.1, 0.1])
    ts = jnp.asarray([0.3, 0.55])
    dw = dwell.dwell_times(ts, 0.0, 0.85, jnp.float64)
    assert np.allclose(np.asarray(dw), [0.3, 0.25, 0.3])
    st = dwell.init_state(con, dw)
    assert np.all(np.asarray(st.slack) > 0) and np.all(
        np.asarray(st.dual) > 0)
    lt, Qtt, r, cmpl, logb = dwell.linearize_condense(con, st, dw)
    # feasible init: residual r = min - dwell + slack = 0
    assert np.allclose(np.asarray(r), 0.0, atol=1e-12)
    # J^T dual: gradient direction pushes dwell times up (away from min)
    assert lt.shape == (2,) and Qtt.shape == (2, 2)
    # FTB: step toward the boundary gets clipped
    dts = jnp.asarray([-1.0, 1.0])     # shrinks phase 0 hard
    dslack, ddual = dwell.expand(con, st, dw, dts)
    ap, ad = dwell.step_sizes(con, st, dslack, ddual)
    assert 0 < float(ap) < 1.0
    # kkt error of a feasible point with exact complementarity ~ 0
    st2 = dwell.DwellState(slack=dw - con.min_dwell,
                           dual=con.barrier / (dw - con.min_dwell))
    assert float(dwell.kkt_error_sq(con, st2, dw)) < 1e-20


def test_sto_cost_quadratic():
    ts = jnp.asarray([0.3, 0.5])
    comp = QuadraticSTOCost(ts_ref=jnp.asarray([0.25, 0.6]),
                            weight=jnp.asarray([2.0, 4.0]))
    c, lt, Qtt = quadratize((comp,), ts)
    assert np.isclose(float(c), 0.5 * (2 * 0.05 ** 2 + 4 * 0.1 ** 2))
    assert np.allclose(np.asarray(lt), [2 * 0.05, 4 * (-0.1)])
    assert np.allclose(np.asarray(Qtt), np.diag([2.0, 4.0]))


def test_sto_cost_user_component():
    """User-defined STO cost component (the reference's
    STOCostFunctionComponentBase, sto_cost_function_component_base.hpp:
    19-80): one differentiable fn(ts) -> scalar; lt/Qtt by autodiff.
    Composes with QuadraticSTOCost in the same container, and works
    under jit."""
    import jax
    from robotoc_tpu.sto.cost import FunctionSTOCost, eval_cost

    # penalize the total duration of phase 1 ending at ts[1]: exp barrier
    def fn(ts):
        return jnp.exp(2.0 * (ts[1] - ts[0])) + 0.1 * ts[0] ** 2

    comp = FunctionSTOCost(fn)
    quad_c = QuadraticSTOCost(ts_ref=jnp.asarray([0.25, 0.6]),
                              weight=jnp.asarray([2.0, 4.0]))
    ts = jnp.asarray([0.3, 0.5])
    c, lt, Qtt = quadratize((comp, quad_c), ts)
    # FD oracle for the user component
    eps = 1e-6
    for k in range(2):
        tp = ts.at[k].add(eps)
        tm = ts.at[k].add(-eps)
        fd = (fn(tp) - fn(tm)) / (2 * eps)
        analytic = float(lt[k]) - float(quad_c.quadratize(ts)[1][k])
        assert np.isclose(analytic, float(fd), rtol=1e-4)
    # Hessian symmetric + contains the quadratic part
    assert np.allclose(np.asarray(Qtt), np.asarray(Qtt).T)
    c_only = eval_cost((comp, quad_c), ts)
    assert np.isclose(float(c_only), float(c))
    # jit-traceable
    c_j = jax.jit(lambda t: quadratize((comp, quad_c), t)[0])(ts)
    assert np.isclose(float(c_j), float(c))


def test_event_sto_flags():
    plc = np.zeros((4, 3))
    sched = ContactSchedule(nc=4).init([True] * 4, plc)
    sched.push_back([False] * 4, plc, 0.3, sto=False)
    sched.push_back([True] * 4, plc, 0.55, sto=True)
    disc = PhaseDiscretization(sched, 0.0, 0.85, 12)
    assert np.allclose(np.asarray(disc.sto_mask), [0.0, 1.0])
