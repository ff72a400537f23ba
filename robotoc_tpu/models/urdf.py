"""URDF -> reduced rigid-body model spec (host-side, numpy).

TPU-native replacement for the reference's Pinocchio URDF path
(reference: src/robot/robot.cpp, pinocchio::urdf::buildModel +
JointModelFreeFlyer). Fixed joints are fused into their parent bodies
(composite inertia) and every link/fixed-joint becomes an operational frame,
so contact frames attached by fixed joints (e.g. quadruped feet) resolve to a
movable parent joint + constant placement.

The output `ModelSpec` is plain numpy + Python structure: the static skeleton
(parents, joint types) is compile-time constant for XLA, while the numeric
arrays become the traced `RobotModel` pytree leaves.
"""
from __future__ import annotations

import dataclasses
import math
import xml.etree.ElementTree as ET

import numpy as np

# Joint type codes (static Python ints, used for trace-time branching).
FREE = 0
REVOLUTE = 1
PRISMATIC = 2


def _rpy_to_R(rpy):
    r, p, y = rpy
    cr, sr = math.cos(r), math.sin(r)
    cp, sp = math.cos(p), math.sin(p)
    cy, sy = math.cos(y), math.sin(y)
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1.0]])
    Ry = np.array([[cp, 0, sp], [0, 1.0, 0], [-sp, 0, cp]])
    Rx = np.array([[1.0, 0, 0], [0, cr, -sr], [0, sr, cr]])
    return Rz @ Ry @ Rx


def _hat(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0.0]])


@dataclasses.dataclass
class _Body:
    """Inertial data in a link frame: mass, com, rotational inertia at com."""
    mass: float
    com: np.ndarray          # (3,)
    I_c: np.ndarray          # (3,3) about com, link-frame axes

    @staticmethod
    def zero():
        return _Body(0.0, np.zeros(3), np.zeros((3, 3)))

    def transformed(self, R, p):
        """This body's inertia re-expressed in a frame where the link sits at
        placement (R, p)."""
        return _Body(self.mass, R @ self.com + p, R @ self.I_c @ R.T)

    def merged(self, other: "_Body"):
        m = self.mass + other.mass
        if m <= 0.0:
            return _Body.zero()
        c = (self.mass * self.com + other.mass * other.com) / m
        I = np.zeros((3, 3))
        for b in (self, other):
            d = b.com - c
            I = I + b.I_c - b.mass * (_hat(d) @ _hat(d))
        return _Body(m, c, I)


@dataclasses.dataclass
class JointSpec:
    name: str
    jtype: int               # FREE / REVOLUTE / PRISMATIC
    parent: int              # index into joints list, -1 = world
    R: np.ndarray            # placement in parent joint frame
    p: np.ndarray
    axis: np.ndarray         # (3,) for revolute/prismatic
    lower: float
    upper: float
    velocity: float
    effort: float


@dataclasses.dataclass
class FrameSpec:
    name: str
    parent_joint: int        # supporting movable joint index, -1 = world/root
    R: np.ndarray
    p: np.ndarray


@dataclasses.dataclass
class ModelSpec:
    name: str
    floating_base: bool
    joints: list             # list[JointSpec], topological order
    bodies: list             # list[_Body], inertia at each joint's frame
    frames: list             # list[FrameSpec]
    nq: int = 0
    nv: int = 0

    def frame_id(self, name: str) -> int:
        for i, f in enumerate(self.frames):
            if f.name == name:
                return i
        raise KeyError(f"unknown frame: {name}")


def _parse_inertial(link_el):
    inert = link_el.find("inertial")
    if inert is None:
        return _Body.zero()
    origin = inert.find("origin")
    xyz = np.zeros(3)
    rpy = np.zeros(3)
    if origin is not None:
        if origin.get("xyz"):
            xyz = np.array([float(x) for x in origin.get("xyz").split()])
        if origin.get("rpy"):
            rpy = np.array([float(x) for x in origin.get("rpy").split()])
    mass = float(inert.find("mass").get("value"))
    ie = inert.find("inertia")
    I = np.array([
        [float(ie.get("ixx")), float(ie.get("ixy")), float(ie.get("ixz"))],
        [float(ie.get("ixy")), float(ie.get("iyy")), float(ie.get("iyz"))],
        [float(ie.get("ixz")), float(ie.get("iyz")), float(ie.get("izz"))],
    ])
    R = _rpy_to_R(rpy)
    return _Body(mass, xyz, R @ I @ R.T)


def parse_urdf(path: str, floating_base: bool, name: str | None = None
               ) -> ModelSpec:
    tree = ET.parse(path)
    robot = tree.getroot()
    model_name = name or robot.get("name", "robot")

    links = {}
    for link in robot.findall("link"):
        links[link.get("name")] = _parse_inertial(link)

    raw_joints = []
    child_of = {}
    for j in robot.findall("joint"):
        jd = {
            "name": j.get("name"),
            "type": j.get("type"),
            "parent": j.find("parent").get("link"),
            "child": j.find("child").get("link"),
            "xyz": np.zeros(3), "rpy": np.zeros(3),
            "axis": np.array([1.0, 0, 0]),
            "lower": -np.inf, "upper": np.inf,
            "velocity": np.inf, "effort": np.inf,
        }
        o = j.find("origin")
        if o is not None:
            if o.get("xyz"):
                jd["xyz"] = np.array([float(x) for x in o.get("xyz").split()])
            if o.get("rpy"):
                jd["rpy"] = np.array([float(x) for x in o.get("rpy").split()])
        a = j.find("axis")
        if a is not None:
            jd["axis"] = np.array([float(x) for x in a.get("xyz").split()])
        lim = j.find("limit")
        if lim is not None:
            for k in ("lower", "upper", "velocity", "effort"):
                if lim.get(k) is not None:
                    jd[k] = float(lim.get(k))
        raw_joints.append(jd)
        child_of[jd["child"]] = jd

    # Root link: one with no parent joint.
    all_children = set(child_of.keys())
    roots = [l for l in links if l not in all_children]
    if len(roots) != 1:
        raise ValueError(f"expected a single root link, got {roots}")
    root = roots[0]

    # Walk the tree from the root. Maintain, per visited link, the supporting
    # movable joint index and the placement of the link frame in that joint's
    # frame.
    joints: list[JointSpec] = []
    bodies: list[_Body] = []
    frames: list[FrameSpec] = []
    children_of_link = {}
    for jd in raw_joints:
        children_of_link.setdefault(jd["parent"], []).append(jd)

    def visit_link(link_name, sup_joint, R, p):
        # Register the link as a frame and fold its inertia into the
        # supporting joint's body.
        frames.append(FrameSpec(link_name, sup_joint, R.copy(), p.copy()))
        if sup_joint >= 0:
            bodies[sup_joint] = bodies[sup_joint].merged(
                links[link_name].transformed(R, p))
        for jd in children_of_link.get(link_name, []):
            Rj = R @ _rpy_to_R(jd["rpy"])
            pj = R @ jd["xyz"] + p
            if jd["type"] == "fixed":
                frames.append(FrameSpec(jd["name"], sup_joint, Rj, pj))
                visit_link(jd["child"], sup_joint, Rj, pj)
            elif jd["type"] in ("revolute", "continuous", "prismatic"):
                jtype = PRISMATIC if jd["type"] == "prismatic" else REVOLUTE
                joints.append(JointSpec(
                    jd["name"], jtype, sup_joint, Rj, pj,
                    jd["axis"].astype(float),
                    jd["lower"], jd["upper"], jd["velocity"], jd["effort"]))
                bodies.append(_Body.zero())
                visit_link(jd["child"], len(joints) - 1,
                           np.eye(3), np.zeros(3))
            else:
                raise ValueError(f"unsupported joint type {jd['type']}")

    if floating_base:
        # Insert a free-flyer as joint 0 supporting the root link.
        joints.append(JointSpec("root_joint", FREE, -1, np.eye(3),
                                np.zeros(3), np.zeros(3),
                                -np.inf, np.inf, np.inf, np.inf))
        bodies.append(_Body.zero())
        visit_link(root, 0, np.eye(3), np.zeros(3))
    else:
        visit_link(root, -1, np.eye(3), np.zeros(3))

    spec = ModelSpec(model_name, floating_base, joints, bodies, frames)
    n_act = sum(1 for j in joints if j.jtype != FREE)
    spec.nq = n_act + (7 if floating_base else 0)
    spec.nv = n_act + (6 if floating_base else 0)
    return spec
