"""JSON (de)serialization of ModelSpec — the framework's native model format.

Robot descriptions ship as JSON specs (generated once from URDFs via
tools/import_urdf.py); `from_json` is the zero-dependency load path used by
tests/examples, while models/urdf.py covers direct URDF import.
"""
from __future__ import annotations

import json

import numpy as np

from .urdf import FrameSpec, JointSpec, ModelSpec, _Body


def spec_to_dict(spec: ModelSpec) -> dict:
    return {
        "name": spec.name,
        "floating_base": spec.floating_base,
        "nq": spec.nq,
        "nv": spec.nv,
        "joints": [{
            "name": j.name, "type": j.jtype, "parent": j.parent,
            "R": j.R.tolist(), "p": j.p.tolist(), "axis": j.axis.tolist(),
            "lower": _num(j.lower), "upper": _num(j.upper),
            "velocity": _num(j.velocity), "effort": _num(j.effort),
        } for j in spec.joints],
        "bodies": [{
            "mass": b.mass, "com": b.com.tolist(), "I_c": b.I_c.tolist(),
        } for b in spec.bodies],
        "frames": [{
            "name": f.name, "parent_joint": f.parent_joint,
            "R": f.R.tolist(), "p": f.p.tolist(),
        } for f in spec.frames],
    }


def _num(x):
    if np.isposinf(x):
        return "inf"
    if np.isneginf(x):
        return "-inf"
    return float(x)


def _denum(x):
    return float(x)


def dict_to_spec(d: dict) -> ModelSpec:
    joints = [JointSpec(
        j["name"], j["type"], j["parent"],
        np.array(j["R"]), np.array(j["p"]), np.array(j["axis"]),
        _denum(j["lower"]), _denum(j["upper"]),
        _denum(j["velocity"]), _denum(j["effort"]),
    ) for j in d["joints"]]
    bodies = [_Body(b["mass"], np.array(b["com"]), np.array(b["I_c"]))
              for b in d["bodies"]]
    frames = [FrameSpec(f["name"], f["parent_joint"],
                        np.array(f["R"]), np.array(f["p"]))
              for f in d["frames"]]
    return ModelSpec(d["name"], d["floating_base"], joints, bodies, frames,
                     nq=d["nq"], nv=d["nv"])


def save_json(spec: ModelSpec, path: str):
    with open(path, "w") as f:
        json.dump(spec_to_dict(spec), f)


def load_json(path: str) -> ModelSpec:
    with open(path) as f:
        return dict_to_spec(json.load(f))
