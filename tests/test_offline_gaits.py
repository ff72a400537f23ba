"""Offline multi-cycle gait OCPs (reference examples/anymal/python/
{bounce,trot_sto1}.py counterparts): the full KKT-line-search Newton
solve must converge the single-cycle bounce problem, and the trot STO
example's machinery must run end-to-end."""
import os
import sys

import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "examples"))


def test_bounce_single_cycle_converges():
    from anymal_bounce import main
    sol, st = main(cycles=1, max_iter=150, html=False)
    assert bool(st["convergence"]), st
    assert float(st["kkt_error"]) < 1e-6
