"""Standalone HTML trajectory viewer (no GUI app, no external deps).

The reference ships an interactive GLFW GUI (mjpc/simulate.cc, ~2.3k LoC)
that this headless TPU framework deliberately descopes; the practical gap
that leaves is *seeing* what a plan does. This closes it: export any
state trajectory (`Agent.best_trajectory()`, a rollout, an estimator
history) as a single self-contained HTML file — inline vanilla-JS canvas
renderer, orbit camera, play/scrub controls, zero network fetches — so it
opens anywhere a browser does, including air-gapped machines.

Rendering model: forward kinematics per frame (physics/kinematics.py)
gives every geom's world position + orientation; geoms are drawn as
depth-sorted primitives under an orthographic orbit projection
(sphere -> disc, capsule/cylinder -> thick segment, box -> projected
face polygons, plane -> grid). That is deliberately simpler than the
reference's full mjvScene; it is a trajectory/trace viewer, not a scene
editor.
"""

from __future__ import annotations

import json
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.physics import kinematics as K
from mujoco_mpc_tpu.physics.model import Data, Model

# mjtGeom enum values (mujoco mjmodel.h)
_PLANE, _HFIELD, _SPHERE, _CAPSULE, _ELLIPSOID, _CYLINDER, _BOX, _MESH = \
    0, 1, 2, 3, 4, 5, 6, 7


def _frames(m: Model, template: Data, states: np.ndarray):
  """FK over a (T, nq+nv[+na]) packed-state trajectory ->
  (T, ngeom, 3) positions and (T, ngeom, 3, 3) rotations."""
  nq, nv = int(m.nq), int(m.nv)

  def fk(state):
    d = template.replace(qpos=state[:nq].astype(template.qpos.dtype),
                         qvel=state[nq:nq + nv].astype(template.qvel.dtype))
    d = K.kinematics(m, d)
    return d.geom_xpos, d.geom_xmat

  xpos, xmat = jax.jit(jax.vmap(fk))(jnp.asarray(states))
  return np.asarray(jax.device_get(xpos)), np.asarray(jax.device_get(xmat))


def trajectory_html(m: Model, template: Data, states: np.ndarray,
                    times: Optional[np.ndarray] = None,
                    title: str = "mujoco_mpc_tpu trajectory",
                    traces: Optional[Sequence[int]] = None) -> str:
  """Render a packed-state trajectory to a self-contained HTML string.

  traces: geom indices whose positions are drawn as fading path lines
  (reference trace%d sensors; defaults to free-body root geoms).
  """
  states = np.asarray(states)
  t_hor = states.shape[0]
  xpos, xmat = _frames(m, template, states)
  if not np.all(np.isfinite(xpos)):
    raise ValueError("trajectory contains non-finite states")
  if times is None:
    times = np.arange(t_hor) * float(np.asarray(m.opt.timestep))
  names = list(m.names.get("geom", []))
  gtype = np.asarray(m.geom_type)
  gsize = np.asarray(m.geom_size_np if m.geom_size_np is not None
                     else jax.device_get(m.geom_size))
  rgba = getattr(m, "geom_rgba_np", None)
  scene = []
  for g in range(len(gtype)):
    scene.append({
        "type": int(gtype[g]),
        "size": [round(float(s), 5) for s in gsize[g]],
        "name": names[g] if g < len(names) else f"geom{g}",
    })
  if traces is None:
    traces = []
  # quantize to keep files small: mm resolution
  pos = np.round(xpos, 4)
  # orientation as the local z-axis column (capsules/cylinders/boxes);
  # boxes additionally get x/y axes
  zax = np.round(xmat[..., :, 2], 4)
  xax = np.round(xmat[..., :, 0], 4)
  yax = np.round(xmat[..., :, 1], 4)
  payload = {
      "title": title,
      "dt": [round(float(t), 5) for t in np.diff(times).tolist()] or [0.01],
      "scene": scene,
      "traces": list(map(int, traces)),
      "pos": pos.tolist(),
      "zax": zax.tolist(),
      "xax": xax.tolist(),
      "yax": yax.tolist(),
  }
  return _HTML.replace("__TITLE__", title).replace(
      "__DATA__", json.dumps(payload, separators=(",", ":")))


def save_trajectory_html(path: str, m: Model, template: Data,
                         states: np.ndarray, **kw) -> str:
  html = trajectory_html(m, template, states, **kw)
  with open(path, "w") as f:
    f.write(html)
  return path


_HTML = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>__TITLE__</title>
<style>
 body{margin:0;background:#14161a;color:#d8dce2;font:13px system-ui}
 #bar{display:flex;gap:10px;align-items:center;padding:8px 12px}
 #bar input[type=range]{flex:1}
 button{background:#2a2f37;color:#d8dce2;border:1px solid #3a404a;
        border-radius:4px;padding:4px 12px;cursor:pointer}
 canvas{display:block;width:100vw;height:calc(100vh - 42px)}
 #hud{position:fixed;right:12px;top:10px;opacity:.7}
</style></head><body>
<div id="bar">
 <button id="play">&#9654;</button>
 <input id="scrub" type="range" min="0" max="0" value="0" step="1">
 <span id="tlabel">t=0.00s</span>
 <span id="hud">drag: orbit &nbsp; wheel: zoom</span>
</div>
<canvas id="cv"></canvas>
<script>
const D = __DATA__;
const cv = document.getElementById('cv'), ctx = cv.getContext('2d');
const scrub = document.getElementById('scrub');
const tlab = document.getElementById('tlabel');
const T = D.pos.length, NG = D.scene.length;
scrub.max = T - 1;
let yaw = 0.7, pitch = 0.42, zoom = 1.0, frame = 0, playing = false;
// scene scale from frame-0 extents
let ext = 0.2;
for (const p of D.pos[0]) ext = Math.max(ext,
  Math.abs(p[0]), Math.abs(p[1]), Math.abs(p[2]));
function proj(p, C) {
  const x = C.cy*p[0] - C.sy*p[1];
  const y = C.sy*p[0] + C.cy*p[1];
  const u = x, v = C.cp*p[2] - C.sp*y, depth = C.cp*y + C.sp*p[2];
  return [C.ox + u*C.s, C.oy - v*C.s, depth];
}
function cam() {
  const s = Math.min(cv.width, cv.height) * 0.36 * zoom / ext;
  return {cy: Math.cos(yaw), sy: Math.sin(yaw),
          cp: Math.cos(pitch), sp: Math.sin(pitch),
          ox: cv.width/2, oy: cv.height/2, s: s};
}
const palette = ['#7aa2f7','#9ece6a','#e0af68','#f7768e','#bb9af7',
                 '#7dcfff','#ff9e64','#73daca'];
function draw() {
  const dpr = window.devicePixelRatio || 1;
  cv.width = cv.clientWidth * dpr; cv.height = cv.clientHeight * dpr;
  const C = cam();
  ctx.clearRect(0, 0, cv.width, cv.height);
  // ground grid at z=0 when any plane geom exists
  if (D.scene.some(g => g.type === 0)) {
    ctx.strokeStyle = '#262b33'; ctx.lineWidth = 1;
    const n = 8, h = ext * 1.5;
    for (let i = -n; i <= n; i++) {
      const a = proj([i*h/n, -h, 0], C), b = proj([i*h/n, h, 0], C);
      const c = proj([-h, i*h/n, 0], C), d = proj([h, i*h/n, 0], C);
      ctx.beginPath(); ctx.moveTo(a[0],a[1]); ctx.lineTo(b[0],b[1]);
      ctx.moveTo(c[0],c[1]); ctx.lineTo(d[0],d[1]); ctx.stroke();
    }
  }
  // traces: full path of selected geoms
  for (const g of D.traces) {
    ctx.strokeStyle = '#e0af6866'; ctx.lineWidth = 1.5;
    ctx.beginPath();
    for (let t = 0; t <= frame; t++) {
      const p = proj(D.pos[t][g], C);
      t ? ctx.lineTo(p[0], p[1]) : ctx.moveTo(p[0], p[1]);
    }
    ctx.stroke();
  }
  // depth-sort geoms back to front
  const order = [];
  for (let g = 0; g < NG; g++) {
    if (D.scene[g].type === 0) continue;           // planes -> grid
    order.push([proj(D.pos[frame][g], C)[2], g]);
  }
  order.sort((a, b) => a[0] - b[0]);
  for (const [, g] of order) {
    const S = D.scene[g], p = D.pos[frame][g];
    const col = palette[g % palette.length];
    ctx.fillStyle = col; ctx.strokeStyle = col;
    const P = proj(p, C);
    if (S.type === 2 || S.type === 4 || S.type === 7) {   // sphere-ish
      ctx.beginPath();
      ctx.arc(P[0], P[1], Math.max(1.5, S.size[0]*C.s), 0, 7);
      ctx.fill();
    } else if (S.type === 3 || S.type === 5) {            // capsule/cyl
      const z = D.zax[frame][g], h = S.size[1];
      const a = proj([p[0]-z[0]*h, p[1]-z[1]*h, p[2]-z[2]*h], C);
      const b = proj([p[0]+z[0]*h, p[1]+z[1]*h, p[2]+z[2]*h], C);
      ctx.lineCap = 'round';
      ctx.lineWidth = Math.max(1.5, 2*S.size[0]*C.s);
      ctx.beginPath(); ctx.moveTo(a[0],a[1]); ctx.lineTo(b[0],b[1]);
      ctx.stroke();
    } else if (S.type === 6) {                            // box
      const X = D.xax[frame][g], Y = D.yax[frame][g], Z = D.zax[frame][g];
      const [sx, sy, sz] = S.size, corners = [];
      for (const ax of [-1, 1]) for (const ay of [-1, 1])
        for (const az of [-1, 1])
          corners.push(proj([
            p[0]+ax*sx*X[0]+ay*sy*Y[0]+az*sz*Z[0],
            p[1]+ax*sx*X[1]+ay*sy*Y[1]+az*sz*Z[1],
            p[2]+ax*sx*X[2]+ay*sy*Y[2]+az*sz*Z[2]], C));
      // convex hull outline (gift wrap on <=8 pts)
      let h0 = 0;
      for (let i = 1; i < 8; i++)
        if (corners[i][0] < corners[h0][0]) h0 = i;
      const hull = [h0]; let cur = h0;
      for (let k = 0; k < 8; k++) {
        let next = (cur + 1) % 8;
        for (let i = 0; i < 8; i++) {
          const c = (corners[next][0]-corners[cur][0]) *
                    (corners[i][1]-corners[cur][1]) -
                    (corners[next][1]-corners[cur][1]) *
                    (corners[i][0]-corners[cur][0]);
          if (c < 0) next = i;
        }
        cur = next; if (cur === h0) break; hull.push(cur);
      }
      ctx.globalAlpha = 0.75; ctx.beginPath();
      hull.forEach((i, k) => k ? ctx.lineTo(corners[i][0], corners[i][1])
                               : ctx.moveTo(corners[i][0], corners[i][1]));
      ctx.closePath(); ctx.fill(); ctx.globalAlpha = 1;
    } else {                                              // fallback dot
      ctx.beginPath(); ctx.arc(P[0], P[1], 3, 0, 7); ctx.fill();
    }
  }
  let tt = 0; for (let t = 0; t < frame; t++) tt += D.dt[Math.min(t, D.dt.length-1)];
  tlab.textContent = 't=' + tt.toFixed(2) + 's  frame ' + frame + '/' + (T-1);
  scrub.value = frame;
}
let dragging = false, px = 0, py = 0;
cv.addEventListener('mousedown', e => {dragging = true; px = e.clientX; py = e.clientY;});
window.addEventListener('mouseup', () => dragging = false);
window.addEventListener('mousemove', e => {
  if (!dragging) return;
  yaw += (e.clientX - px) * 0.008; pitch += (e.clientY - py) * 0.008;
  pitch = Math.max(-1.55, Math.min(1.55, pitch));
  px = e.clientX; py = e.clientY; draw();
});
cv.addEventListener('wheel', e => {
  zoom *= Math.exp(-e.deltaY * 0.001); e.preventDefault(); draw();
}, {passive: false});
scrub.addEventListener('input', () => {frame = +scrub.value; draw();});
document.getElementById('play').addEventListener('click', function () {
  playing = !playing; this.innerHTML = playing ? '&#10074;&#10074;' : '&#9654;';
  if (playing) tick();
});
function tick() {
  if (!playing) return;
  frame = (frame + 1) % T; draw();
  setTimeout(tick, 1000 * D.dt[Math.min(frame, D.dt.length-1)]);
}
window.addEventListener('resize', draw);
draw();
</script></body></html>
"""
