"""Discrete-time (per-contact-phase) swing-foot / CoM references
(reference discrete_time_swing_foot_ref.cpp:52-78,
discrete_time_com_ref.cpp:23-101)."""
import numpy as np

import jax
import jax.numpy as jnp

from robotoc_tpu.costs.task_cost import (make_discrete_time_com_ref,
                                         make_discrete_time_swing_refs)
from robotoc_tpu.planner.contact_sequence import ContactSchedule


def _schedule():
    # 3 phases: stand [0, 0.1) | contact-0 swing [0.1, 0.4) | stand
    plc0 = np.array([[0.3, 0.2, 0.0], [-0.3, 0.2, 0.0]])
    plc1 = plc0.copy()
    plc1[0, 0] += 0.2   # contact 0 lands 0.2 ahead
    sched = ContactSchedule(nc=2).init([True, True], plc0, t0=0.0)
    sched.push_back([False, True], plc0, 0.1)
    sched.push_back([True, True], plc1, 0.4)
    return sched, plc0, plc1


def test_discrete_swing_ref_interpolates_prev_to_next():
    sched, plc0, plc1 = _schedule()
    refs = make_discrete_time_swing_refs(sched, 0.6, 0.15, jnp.float64)
    r0, r1 = refs

    # stance phases: inactive
    for t in (0.05, 0.5):
        _, act = r0(jnp.asarray(t))
        assert float(act) == 0.0
    # the non-swinging contact is never active
    for t in (0.05, 0.25, 0.5):
        _, act = r1(jnp.asarray(t))
        assert float(act) == 0.0

    # mid-swing: halfway from pre-swing to post-swing placement, apex z
    p, act = r0(jnp.asarray(0.25))
    assert float(act) == 1.0
    expect = 0.5 * (plc0[0] + plc1[0]) + np.array([0, 0, 0.15])
    np.testing.assert_allclose(np.asarray(p), expect, atol=1e-12)

    # quarter-swing: rate 0.25 -> z = 2*0.25*h
    p, _ = r0(jnp.asarray(0.175))
    expect = 0.75 * plc0[0] + 0.25 * plc1[0] + np.array([0, 0, 0.075])
    np.testing.assert_allclose(np.asarray(p), expect, atol=1e-12)

    # swing refs stack for MultiFrameTaskCost
    stacked = jax.tree.map(lambda *x: jnp.stack(x), *refs)
    ps, acts = jax.vmap(lambda r: r(jnp.asarray(0.25)))(stacked)
    assert ps.shape == (2, 3) and acts.shape == (2,)


def test_discrete_com_ref_moves_through_swing_phase():
    sched, plc0, plc1 = _schedule()
    com_to_contact = np.array([[0.3, 0.0, -0.45], [-0.3, 0.0, -0.45]])
    ref = make_discrete_time_com_ref(sched, 0.6, com_to_contact,
                                     jnp.float64)
    com_stand0 = (plc0 - com_to_contact).mean(axis=0)
    com_swing = plc0[1] - com_to_contact[1]   # only contact 1 active
    com_stand1 = (plc1 - com_to_contact).mean(axis=0)

    # full stance: held at the phase anchor
    p, act = ref(jnp.asarray(0.05))
    np.testing.assert_allclose(np.asarray(p), com_stand0, atol=1e-12)
    assert float(act) == 1.0
    # mid-swing: interpolates this phase's anchor -> next phase's anchor
    p, _ = ref(jnp.asarray(0.25))
    np.testing.assert_allclose(np.asarray(p),
                               0.5 * (com_swing + com_stand1), atol=1e-12)
