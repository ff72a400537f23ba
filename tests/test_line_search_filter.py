"""Fletcher-Leyffer filter semantics (reference
line_search_filter.cpp isAccepted/augment).

Round-3 regression for the advisor's finding: the static (+inf, +inf)
empty slots made every margin inf - inf = NaN, so filter_accepts was
always False and filter-mode line search backtracked to alpha_min on
every Newton step.
"""
import jax.numpy as jnp
import numpy as np

from robotoc_tpu.line_search import line_search as ls


def test_empty_filter_accepts():
    filt = ls.empty_filter()
    # reference: LineSearchFilter::isAccepted returns true on empty filter
    assert bool(ls.filter_accepts(filt, 10.0, 5.0))
    assert bool(ls.filter_accepts(filt, jnp.inf, 0.0))


def test_filter_accept_reject_matches_reference():
    filt = ls.empty_filter()
    filt = ls.filter_augment(filt, 0, 1.0, 1.0)
    rate = 0.005
    # accepted: improves cost vs the entry by its margin
    assert bool(ls.filter_accepts(filt, 1.0 - 2 * rate, 1.0,
                                  cost_rate=rate, viol_rate=rate))
    # accepted: improves violation (viol < (1-rate) * entry_viol)
    assert bool(ls.filter_accepts(filt, 5.0, 0.9,
                                  cost_rate=rate, viol_rate=rate))
    # rejected: dominated on both axes
    assert not bool(ls.filter_accepts(filt, 1.0, 1.0,
                                      cost_rate=rate, viol_rate=rate))
    assert not bool(ls.filter_accepts(filt, 2.0, 1.5,
                                      cost_rate=rate, viol_rate=rate))
    # reference semantics: ANY entry's condition suffices — add a second,
    # much worse entry; a pair dominated by entry 0 but improving on
    # entry 1 is accepted
    filt = ls.filter_augment(filt, 1, 100.0, 100.0)
    assert bool(ls.filter_accepts(filt, 2.0, 1.5,
                                  cost_rate=rate, viol_rate=rate))


def test_filter_augment_drops_nonfinite():
    filt = ls.empty_filter()
    filt = ls.filter_augment(filt, 0, jnp.nan, 1.0)
    # NaN entry must not enter the filter (it would permanently reject
    # every trial); the filter stays empty and accepting
    assert bool(ls.filter_accepts(filt, 1e9, 1e9))
    filt = ls.filter_augment(filt, 0, 1.0, jnp.inf)
    assert bool(ls.filter_accepts(filt, 1e9, 1e9))
    filt = ls.filter_augment(filt, 0, 1.0, 1.0)
    assert not bool(ls.filter_accepts(filt, 2.0, 2.0))


def test_filter_search_takes_full_step_on_empty_filter():
    # with an empty filter the first trial (alpha_max) must be accepted
    # without any backtracking
    def trial(alpha):
        return alpha

    def ev(alpha):
        return jnp.asarray(1.0), jnp.asarray(1.0)

    alpha, c, v = ls.filter_search(trial, ev, jnp.asarray(1.0),
                                   ls.empty_filter())
    assert np.isclose(float(alpha), 1.0)
