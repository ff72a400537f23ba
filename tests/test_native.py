"""Native C++ grid baker vs the Python oracle
(robotoc_tpu/native/src/grid_baker.cpp vs planner.contact_sequence)."""
import numpy as np
import pytest

import jax.numpy as jnp

from robotoc_tpu import native
from robotoc_tpu.planner.contact_sequence import ContactSchedule, discretize


def _schedule(nc=4):
    plc = np.arange(nc * 3, dtype=float).reshape(nc, 3) * 0.1
    sched = ContactSchedule(nc=nc).init([True] * nc, plc)
    sched.push_back([False] * nc, plc, 0.31)                 # lift
    sched.push_back([True] * nc, plc + [0.4, 0, 0], 0.57)    # impact
    sched.push_back([True, False, True, False][:nc],
                    plc + [0.4, 0, 0], 0.74)                 # partial lift
    return sched


def test_native_available():
    assert native.available(), "native library failed to build/load"


@pytest.mark.parametrize("n_reserved", [1, 3])
def test_native_matches_python(n_reserved):
    sched = _schedule()
    a = discretize(sched, 0.0, 1.0, 14, n_reserved=n_reserved,
                   use_native=False)
    b = discretize(sched, 0.0, 1.0, 14, n_reserved=n_reserved,
                   use_native=True)
    for field in ["t", "dt", "contact_mask", "p_ref", "friction",
                  "is_impact", "imp_mask", "R_ref"]:
        va = np.asarray(getattr(a, field))
        vb = np.asarray(getattr(b, field))
        assert va.shape == vb.shape, field
        assert np.allclose(va, vb, atol=1e-12), (
            f"{field} differs:\n{va}\nvs\n{vb}")


def test_native_matches_python_mpc_window():
    """Sliding MPC windows (t0 > 0, events straddling the boundary)."""
    sched = _schedule()
    for t0 in [0.0, 0.15, 0.305, 0.5, 0.72]:
        a = discretize(sched, t0, 0.5, 10, n_reserved=2, use_native=False)
        b = discretize(sched, t0, 0.5, 10, n_reserved=2, use_native=True)
        assert np.allclose(np.asarray(a.t), np.asarray(b.t), atol=1e-12)
        assert np.allclose(np.asarray(a.contact_mask),
                           np.asarray(b.contact_mask))
        assert np.allclose(np.asarray(a.imp_mask), np.asarray(b.imp_mask))
        assert np.allclose(np.asarray(a.dt), np.asarray(b.dt), atol=1e-12)


def test_native_too_many_impacts_raises():
    sched = _schedule()
    with pytest.raises(ValueError):
        discretize(sched, 0.0, 1.0, 14, n_reserved=0, use_native=True)
