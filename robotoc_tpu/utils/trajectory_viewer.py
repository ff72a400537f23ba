"""Self-contained 3D trajectory viewer: solution -> one HTML file.

Counterpart of the reference's TrajectoryViewer
(reference bindings/python/robotoc/utils/trajectory_viewer.py:10-227),
which displays the robot in gepetto-gui / meshcat / rviz. The TPU build
targets headless environments with zero egress, so instead of a viewer
*server* this writes ONE dependency-free HTML file: the kinematic
skeleton (joint frames + links), contact-force arrows (reference
:171-206 `display(..., contact_forces)`) and the CoM trace are baked in
as JSON and animated with a small vanilla-canvas 3D renderer (drag to
orbit, wheel to zoom, space to pause).

Usage:
    viewer = TrajectoryViewer(model, contacts=contacts, force_scale=None)
    viewer.write_html("traj.html", qs, dt=0.02, forces=fs)
"""
from __future__ import annotations

import json
from typing import Optional

import numpy as np


def _skeleton_edges(model):
    """(parent, child) joint index pairs (skip the invisible root)."""
    edges = []
    for j, p in enumerate(model.parents):
        if p >= 0:
            edges.append((int(p), int(j)))
    return edges


class TrajectoryViewer:
    def __init__(self, model, contacts=None, force_scale: Optional[float]
                 = None, camera_focus=None):
        """force_scale: meters per Newton for the force arrows; default
        auto-scales the largest force to 0.3 m (the reference scales by
        total weight, trajectory_viewer.py:183)."""
        self.model = model
        self.contacts = contacts
        self.force_scale = force_scale
        self.camera_focus = camera_focus

    def _frames(self, qs):
        from ..models import robot as rm
        import jax
        import jax.numpy as jnp

        qs = jnp.asarray(qs)
        Rw, pw = jax.vmap(lambda q: rm.forward_kinematics(self.model, q))(qs)
        joints = np.asarray(pw)                       # (T, nj, 3)
        coms = np.asarray(jax.vmap(
            lambda q: rm.com(self.model, q))(qs))     # (T, 3)
        feet = None
        if self.contacts is not None:
            fids = list(self.contacts.frame_ids)

            def foot_pos(R1, p1):
                return jnp.stack([rm.frame_placement(
                    self.model, f, R1, p1)[1] for f in fids])

            feet = np.asarray(jax.vmap(foot_pos)(Rw, pw))  # (T, nc, 3)
        return joints, coms, feet

    def write_html(self, path: str, qs, dt: float = 0.02, forces=None,
                   title: str = "robotoc_tpu trajectory"):
        """qs: (T, nq) configurations; forces: optional (T, nf) local
        contact force stacks (3 per point contact, world-z arrows drawn
        at the contact frames). Returns the path."""
        joints, coms, feet = self._frames(qs)
        T = joints.shape[0]
        fdata = None
        if forces is not None and self.contacts is not None \
                and feet is not None:
            f = np.asarray(forces, dtype=float)
            nc = self.contacts.n_contacts
            f3 = f[:, :3 * nc].reshape(T, nc, 3)
            sc = self.force_scale
            if sc is None:
                fmax = float(np.abs(f3).max())
                sc = 0.3 / fmax if fmax > 0 else 0.0
            fdata = (f3 * sc).tolist()
        edges = _skeleton_edges(self.model)
        data = dict(
            dt=float(dt),
            joints=np.round(joints, 5).tolist(),
            com=np.round(coms, 5).tolist(),
            feet=None if feet is None else np.round(feet, 5).tolist(),
            forces=fdata,
            edges=edges,
            focus=(list(self.camera_focus) if self.camera_focus is not None
                   else np.round(joints[0].mean(axis=0), 4).tolist()),
        )
        html = _TEMPLATE.replace("__TITLE__", title).replace(
            "__DATA__", json.dumps(data))
        with open(path, "w") as fp:
            fp.write(html)
        return path


_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>__TITLE__</title>
<style>
 body{margin:0;background:#101014;color:#ddd;font:13px sans-serif;
      overflow:hidden}
 #hud{position:fixed;left:10px;top:8px;opacity:.8}
 canvas{display:block}
</style></head><body>
<div id="hud">__TITLE__ &mdash; drag: orbit &middot; wheel: zoom &middot;
space: pause &middot; <span id="t"></span></div>
<canvas id="c"></canvas>
<script>
const D=__DATA__;
const cv=document.getElementById('c'),cx=cv.getContext('2d');
let W,H;function rs(){W=cv.width=innerWidth;H=cv.height=innerHeight}
rs();addEventListener('resize',rs);
let yaw=0.7,pitch=0.35,dist=2.2,run=true,k=0;
let px=0,py=0,drag=false;
cv.onmousedown=e=>{drag=true;px=e.clientX;py=e.clientY};
addEventListener('mouseup',()=>drag=false);
addEventListener('mousemove',e=>{if(!drag)return;
 yaw+=(e.clientX-px)*.01;pitch+=(e.clientY-py)*.01;
 pitch=Math.max(-1.5,Math.min(1.5,pitch));px=e.clientX;py=e.clientY});
addEventListener('wheel',e=>{dist*=Math.exp(e.deltaY*.001)});
addEventListener('keydown',e=>{if(e.code==='Space')run=!run});
const F=D.focus;
function proj(p){
 // world z-up -> camera
 let x=p[0]-F[0],y=p[1]-F[1],z=p[2]-F[2];
 let cx1=Math.cos(yaw),sx=Math.sin(yaw);
 let u=cx1*x+sx*y, v=-sx*x+cx1*y;
 let cp=Math.cos(pitch),sp=Math.sin(pitch);
 let w2=cp*z-sp*u, u2=sp*z+cp*u;
 const f=0.9*Math.min(W,H)/dist;
 return [W/2+v*f, H/2-w2*f, u2];
}
function line(a,b,st,lw){cx.strokeStyle=st;cx.lineWidth=lw;
 cx.beginPath();cx.moveTo(a[0],a[1]);cx.lineTo(b[0],b[1]);cx.stroke()}
function dot(a,r,st){cx.fillStyle=st;cx.beginPath();
 cx.arc(a[0],a[1],r,0,7);cx.fill()}
function grid(){
 for(let i=-5;i<=5;i++){
  line(proj([i*.2+F[0],-1+F[1],0]),proj([i*.2+F[0],1+F[1],0]),
       '#23232c',1);
  line(proj([-1+F[0],i*.2+F[1],0]),proj([1+F[0],i*.2+F[1],0]),
       '#23232c',1);}}
let last=0,acc=0;
function frame(ts){
 requestAnimationFrame(frame);
 const dtms=ts-last;last=ts;
 if(run){acc+=dtms/1000;while(acc>D.dt){acc-=D.dt;k=(k+1)%D.joints.length}}
 cx.fillStyle='#101014';cx.fillRect(0,0,W,H);
 grid();
 // CoM trace
 cx.strokeStyle='#4a6db5';cx.lineWidth=1.2;cx.beginPath();
 for(let i=0;i<=k;i++){const p=proj(D.com[i]);
  i?cx.lineTo(p[0],p[1]):cx.moveTo(p[0],p[1])}
 cx.stroke();
 const J=D.joints[k];
 for(const e of D.edges)line(proj(J[e[0]]),proj(J[e[1]]),'#cfcfd8',2.5);
 for(const p of J)dot(proj(p),3,'#8fb4ff');
 dot(proj(D.com[k]),4.5,'#ffb84d');
 if(D.feet){const Ft=D.feet[k];
  for(let c=0;c<Ft.length;c++){const fp=proj(Ft[c]);dot(fp,3.5,'#6dd3a0');
   if(D.forces){const fv=D.forces[k][c];
    const tip=proj([Ft[c][0]+fv[0],Ft[c][1]+fv[1],Ft[c][2]+fv[2]]);
    line(fp,tip,'#e0634d',2)}}}
 document.getElementById('t').textContent=
  't = '+(k*D.dt).toFixed(3)+' s  ['+(k+1)+'/'+D.joints.length+']';
}
requestAnimationFrame(frame);
</script></body></html>
"""
