"""Utilities: timing, derivative checking, rotations, plots, checkpointing
(reference include/robotoc/utils/ + bindings/python/robotoc/utils/)."""
from .benchmark import Timer, cpu_time
from .derivative_checker import DerivativeChecker
from . import rotation

__all__ = ["Timer", "cpu_time", "DerivativeChecker", "rotation"]
