"""Trajectory viewer smoke test (reference
bindings/python/robotoc/utils/trajectory_viewer.py:10-227 parity: the TPU
build writes a self-contained HTML animation instead of driving a
meshcat/gepetto server)."""
import os

import numpy as np

import jax.numpy as jnp

from robotoc_tpu.models import load_robot
from robotoc_tpu.models.contacts import make_contacts
from robotoc_tpu.utils.trajectory_viewer import TrajectoryViewer

FEET = ["LF_FOOT", "LH_FOOT", "RF_FOOT", "RH_FOOT"]


def test_write_html(tmp_path):
    m = load_robot("anymal")
    contacts = make_contacts(m, FEET, baumgarte_time_step=0.04)
    q0 = jnp.array([0, 0, 0.4792, 0, 0, 0, 1, -0.1, 0.7, -1.0,
                    -0.1, -0.7, 1.0, 0.1, 0.7, -1.0, 0.1, -0.7, 1.0])
    T = 5
    qs = jnp.broadcast_to(q0, (T, m.nq))
    fs = np.zeros((T, contacts.max_dimf))
    fs[:, 2::3] = 100.0
    out = str(tmp_path / "traj.html")
    viewer = TrajectoryViewer(m, contacts=contacts)
    path = viewer.write_html(out, qs, dt=0.02, forces=fs)
    assert os.path.exists(path)
    html = open(path).read()
    assert "requestAnimationFrame" in html
    assert '"joints"' in html and '"forces"' in html
    # joint count serialized = nj frames per time step
    import json
    data = json.loads(html.split("const D=")[1].split(";\n")[0])
    assert len(data["joints"]) == T
    assert len(data["joints"][0]) == m.nj
    assert len(data["feet"][0]) == 4


def test_fixed_base_no_contacts(tmp_path):
    m = load_robot("iiwa14")
    qs = jnp.zeros((3, m.nq))
    out = str(tmp_path / "arm.html")
    TrajectoryViewer(m).write_html(out, qs, dt=0.05)
    assert os.path.getsize(out) > 1000
