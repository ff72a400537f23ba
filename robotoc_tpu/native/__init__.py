"""Native (C++) host-runtime components, loaded via ctypes.

The TPU compute path is JAX/XLA; the host runtime around it — here the
control-rate grid baking that turns a ContactSchedule into the solver's
static-shape slot arrays — is native C++ like the reference's
TimeDiscretization (reference src/ocp/time_discretization.cpp). Falls back
to the pure-Python implementation when the shared library has not been
built (`make -C robotoc_tpu/native`); an auto-build is attempted once.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(__file__)
_SO = os.path.join(_DIR, "librtpu_native.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.rtpu_bake_grid.restype = ctypes.c_int
    lib.rtpu_bake_grid.argtypes = [
        ctypes.c_double, ctypes.c_double, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def bake_grid(schedule, t0: float, T: float, N: int, n_reserved: int):
    """Native equivalent of planner.contact_sequence.discretize: returns
    numpy arrays (t, dt, contact_mask, p_ref, friction, is_impact,
    imp_mask, R_ref) or None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    nc = schedule.nc
    n_events = len(schedule.phases) - 1
    event_times = np.asarray(
        [p.start_time for p in schedule.phases[1:]], np.float64)
    event_imp = np.asarray(schedule.event_is_impact, np.uint8)
    phase_active = np.stack(
        [p.active for p in schedule.phases]).astype(np.uint8)
    phase_pref = np.ascontiguousarray(
        np.stack([p.placements for p in schedule.phases]), np.float64)
    phase_fric = np.ascontiguousarray(
        np.stack([p.friction for p in schedule.phases]), np.float64)
    phase_rot = np.ascontiguousarray(
        np.stack([p.rotations for p in schedule.phases]), np.float64)

    S = N + 1 + n_reserved
    t = np.empty(S)
    dt = np.empty(max(S - 1, 1))
    contact_mask = np.empty((S, nc))
    p_ref = np.empty((S, nc, 3))
    friction = np.empty((S, nc))
    is_impact = np.empty(S)
    imp_mask = np.empty((S, nc))
    R_ref = np.empty((S, nc, 9))
    rc = lib.rtpu_bake_grid(
        float(t0), float(T), int(N), int(n_reserved), nc, n_events,
        event_times, event_imp,
        np.ascontiguousarray(phase_active),
        phase_pref.reshape(-1), phase_fric.reshape(-1),
        phase_rot.reshape(-1),
        t, dt, contact_mask.reshape(-1), p_ref.reshape(-1),
        friction.reshape(-1), is_impact, imp_mask.reshape(-1),
        R_ref.reshape(-1))
    if rc == -1:
        raise ValueError("more impact events than reserved slots")
    if rc != 0:
        return None
    return (t, dt, contact_mask, p_ref, friction, is_impact, imp_mask,
            R_ref.reshape(S, nc, 3, 3))
