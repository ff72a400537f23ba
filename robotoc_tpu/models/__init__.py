"""Robot model layer: URDF/JSON import, kinematics + dynamics kernels."""
import os

import jax.numpy as jnp

from . import robot
from .robot import (RobotModel, com, crba, d_difference_dq0, d_difference_dq1,
                    difference, forward_kinematics, frame_placement,
                    frame_position, frame_velocity, from_spec, from_urdf,
                    integrate, interpolate, neutral, nonlinear_effects,
                    normalize, random_configuration, rnea, rnea_derivatives,
                    rnea_impact, rnea_impact_derivatives,
                    set_robot_properties, tangent_jacobian)
from .serialize import load_json, save_json
from .urdf import ModelSpec, parse_urdf

_DESC_DIR = os.path.join(os.path.dirname(__file__), "..", "descriptions")


def load_robot(name: str, dtype=jnp.float64) -> RobotModel:
    """Load a bundled robot description (iiwa14, anymal, a1, icub)."""
    path = os.path.join(_DESC_DIR, f"{name}.json")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"no bundled description '{name}' (have: "
            f"{sorted(f[:-5] for f in os.listdir(_DESC_DIR))})")
    return from_spec(load_json(path), dtype=dtype)
