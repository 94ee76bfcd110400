"""Live browser viewer for the UI-agent loop (reference GUI-app role).

The reference's day-to-day surface is the interactive GLFW app — watch
the physics run, flip planners/modes, drag cost-weight sliders, see the
cost plots update live (mjpc/simulate.cc + app.cc:209-345 +
agent.cc:529-1116). The TPU-first equivalent needs no GLFW: this module
serves a live browser page from the SAME process as the UiAgentService
loop (grpc/ui_agent_service.py), with

  * a streaming scene view: Server-Sent Events at ~30 Hz carrying geom
    poses computed on the physics thread (the canvas renderer is shared
    with the static trajectory viewer, utils/viewer.py);
  * play / pause / real-time-speed controls (app.cc real-time sync);
  * cost-weight sliders -> the SetCostWeights path, task-parameter
    inputs -> SetTaskParameters, mode/planner selectors -> SetMode
    (agent.cc:353-448 name-based setters — the exact RPC surface, so
    anything the GUI can set stays settable programmatically too);
  * a live cost-term strip chart from GetCostValuesAndWeights;
  * click-nudge perturbation: a velocity impulse on a chosen body
    (simulate.cc perturb role, reduced to its headless core).

Every mutation runs as a RunBeforeStep job on the physics thread — the
same synchronization contract as the gRPC RPCs (ui_agent_service.cc:
72-120), so the viewer can never race the loop.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from mujoco_mpc_tpu.grpc import agent_pb2


class _FrameBus:
  """Latest-frame cache fed by one sampler thread; SSE handlers wait on
  the condition variable instead of posting their own physics jobs."""

  def __init__(self):
    self.cv = threading.Condition()
    self.seq = 0
    self.frame = None

  def publish(self, frame):
    with self.cv:
      self.seq += 1
      self.frame = frame
      self.cv.notify_all()

  def wait_next(self, last_seq, timeout=2.0):
    with self.cv:
      self.cv.wait_for(lambda: self.seq > last_seq, timeout)
      return self.seq, self.frame


class LiveViewer:
  """HTTP server attached to a UiAgentServicer with a running LiveLoop."""

  def __init__(self, servicer, port: int = 0, fps: float = 30.0,
               cost_every: int = 5):
    self.servicer = servicer
    self.fps = fps
    self.cost_every = cost_every
    self.bus = _FrameBus()
    self._clients = 0
    self._stop = threading.Event()
    self._sampler = None
    handler = _make_handler(self)
    self.httpd = ThreadingHTTPServer(("127.0.0.1", port), handler)
    self.port = self.httpd.server_address[1]
    self._http_thread = threading.Thread(
        target=self.httpd.serve_forever, daemon=True)
    self._http_thread.start()

  # -- lifecycle -------------------------------------------------------------

  def stop(self):
    self._stop.set()
    self.httpd.shutdown()
    self._http_thread.join(timeout=10)
    if self._sampler is not None:
      self._sampler.join(timeout=10)

  def url(self) -> str:
    return f"http://127.0.0.1:{self.port}/"

  # -- physics-thread plumbing ----------------------------------------------

  def _agent(self):
    agent = self.servicer.agent
    if agent is None:
      raise RuntimeError("viewer attached before Init")
    return agent

  def on_physics(self, fn):
    return self.servicer.on_physics(fn)

  def _client_connected(self):
    with self.bus.cv:
      self._clients += 1
      if self._sampler is None or not self._sampler.is_alive():
        self._sampler = threading.Thread(target=self._sample_loop,
                                         daemon=True)
        self._sampler.start()

  def _client_gone(self):
    with self.bus.cv:
      self._clients -= 1

  def _sample_loop(self):
    import jax
    tick = 0
    period = 1.0 / self.fps
    while not self._stop.is_set():
      if self._clients <= 0:
        with self.bus.cv:
          if self._clients <= 0:
            self._sampler = None
            return
      t0 = time.perf_counter()
      with_costs = tick % self.cost_every == 0
      try:
        frame = self.on_physics(lambda: self._snapshot(with_costs))
        self.bus.publish(frame)
      except Exception as e:  # noqa: BLE001 — keep streaming
        self.bus.publish({"error": str(e)[:200]})
      tick += 1
      dt = period - (time.perf_counter() - t0)
      if dt > 0:
        time.sleep(dt)

  def _snapshot(self, with_costs: bool):
    """Runs ON the physics thread: read poses (FK already done by the
    loop's forward/step) + optionally the live cost terms."""
    import jax
    agent = self._agent()
    d = agent.data
    pos = np.asarray(jax.device_get(d.geom_xpos), np.float64)
    xmat = np.asarray(jax.device_get(d.geom_xmat), np.float64)
    loop = getattr(self.servicer, "loop", None)
    frame = {
        "t": float(d.time),
        "steps": int(loop.step_count) if loop is not None else 0,
        "speed": float(loop.real_time_speed) if loop is not None else 1.0,
        "paused": bool(getattr(loop, "paused", False)),
        "pos": np.round(pos, 4).tolist(),
        "xax": np.round(xmat[..., :, 0], 4).tolist(),
        "yax": np.round(xmat[..., :, 1], 4).tolist(),
        "zax": np.round(xmat[..., :, 2], 4).tolist(),
    }
    if with_costs:
      resp = self.servicer.GetCostValuesAndWeights(
          agent_pb2.GetCostValuesAndWeightsRequest(), None)
      frame["costs"] = {
          name: {"value": vw.value, "weight": vw.weight}
          for name, vw in resp.values_weights.items()}
    return frame

  # -- static page data ------------------------------------------------------

  def scene(self):
    import jax
    agent = self._agent()
    m = agent.task.model
    gtype = np.asarray(m.geom_type)
    gsize = np.asarray(m.geom_size_np if getattr(m, "geom_size_np", None)
                       is not None else jax.device_get(m.geom_size))
    names = list(m.names.get("geom", []))
    bodies = list(m.names.get("body", []))
    return {
        "task": agent.task.name,
        "scene": [{"type": int(gtype[g]),
                   "size": [round(float(s), 5) for s in gsize[g]],
                   "name": names[g] if g < len(names) else f"geom{g}"}
                  for g in range(len(gtype))],
        "bodies": bodies,
        "timestep": float(np.asarray(jax.device_get(m.opt.timestep))),
    }

  def info(self):
    """Widget-building data: weights, params, modes, planner names."""
    resp = self.on_physics(lambda: self.servicer.GetCostValuesAndWeights(
        agent_pb2.GetCostValuesAndWeightsRequest(), None))
    weights = {name: vw.weight for name, vw in resp.values_weights.items()}
    modes = self.on_physics(lambda: self.servicer.GetAllModes(
        agent_pb2.GetAllModesRequest(), None)).mode_names
    mode = self.on_physics(lambda: self.servicer.GetMode(
        agent_pb2.GetModeRequest(), None)).mode
    params = self.on_physics(lambda: self.servicer.GetTaskParameters(
        agent_pb2.GetTaskParametersRequest(), None)).parameters
    pdict = {}
    for name, val in params.items():
      which = val.WhichOneof("value")
      pdict[name] = (val.numeric if which == "numeric" else val.selection)
    from mujoco_mpc_tpu import planners
    return {"weights": weights, "modes": list(modes), "mode": mode,
            "parameters": pdict, "planners": planners.PLANNER_NAMES}

  # -- mutations (all via the servicer = the tested RPC surface) ------------

  def set_weights(self, weights: dict):
    self.on_physics(lambda: self.servicer.SetCostWeights(
        agent_pb2.SetCostWeightsRequest(
            cost_weights={k: float(v) for k, v in weights.items()}), None))

  def set_parameters(self, params: dict):
    msg = {}
    for k, v in params.items():
      if isinstance(v, str):
        msg[k] = agent_pb2.TaskParameterValue(selection=v)
      else:
        msg[k] = agent_pb2.TaskParameterValue(numeric=float(v))
    self.on_physics(lambda: self.servicer.SetTaskParameters(
        agent_pb2.SetTaskParametersRequest(parameters=msg), None))

  def set_mode(self, mode: str):
    self.on_physics(lambda: self.servicer.SetMode(
        agent_pb2.SetModeRequest(mode=mode), None))

  def set_speed(self, speed: float):
    loop = self.servicer.loop
    if loop is not None:
      loop.real_time_speed = max(float(speed), 1e-3)

  def set_paused(self, paused: bool):
    loop = self.servicer.loop
    if loop is not None:
      loop.paused = bool(paused)

  def perturb(self, body: str, dvel):
    """Velocity impulse on a named body's root dofs (simulate.cc perturb
    reduced to its headless core)."""
    def apply():
      import jax.numpy as jnp
      agent = self._agent()
      m = agent.task.model
      bodies = list(m.names.get("body", []))
      if body not in bodies:
        raise ValueError(f"unknown body {body!r}")
      bid = bodies.index(body)
      mask = np.asarray(m.body_dof_mask[bid], bool)
      dofs = np.nonzero(mask)[0]
      if len(dofs) == 0:
        raise ValueError(f"body {body!r} has no dofs")
      d = agent.data
      qvel = np.asarray(d.qvel, np.float64).copy()
      dv = np.asarray(dvel, np.float64)
      take = dofs[-min(len(dofs), max(len(dv), 1)):]
      qvel[take[:len(dv)]] += dv[:len(take)]
      agent.data = agent._forward(
          d.replace(qvel=jnp.asarray(qvel, d.qvel.dtype)))
    self.on_physics(apply)


def _make_handler(viewer: LiveViewer):
  class Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet
      pass

    def _json(self, obj, code=200):
      body = json.dumps(obj).encode()
      self.send_response(code)
      self.send_header("Content-Type", "application/json")
      self.send_header("Content-Length", str(len(body)))
      self.end_headers()
      self.wfile.write(body)

    def do_GET(self):
      if self.path in ("/", "/index.html"):
        page = _PAGE.replace("__SCENE__", json.dumps(viewer.scene()))
        body = page.encode()
        self.send_response(200)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)
        return
      if self.path == "/api/info":
        self._json(viewer.info())
        return
      if self.path == "/events":
        self.send_response(200)
        self.send_header("Content-Type", "text/event-stream")
        self.send_header("Cache-Control", "no-cache")
        self.end_headers()
        viewer._client_connected()
        seq = 0
        try:
          while not viewer._stop.is_set():
            seq, frame = viewer.bus.wait_next(seq)
            if frame is None:
              continue
            self.wfile.write(
                b"data: " + json.dumps(frame).encode() + b"\n\n")
            self.wfile.flush()
        except (BrokenPipeError, ConnectionResetError, OSError):
          pass
        finally:
          viewer._client_gone()
        return
      self._json({"error": "not found"}, 404)

    def do_POST(self):
      length = int(self.headers.get("Content-Length", 0))
      try:
        body = json.loads(self.rfile.read(length) or b"{}")
      except json.JSONDecodeError:
        self._json({"error": "bad json"}, 400)
        return
      try:
        if self.path == "/api/weights":
          viewer.set_weights(body)
        elif self.path == "/api/parameters":
          viewer.set_parameters(body)
        elif self.path == "/api/mode":
          viewer.set_mode(body["mode"])
        elif self.path == "/api/speed":
          viewer.set_speed(body["speed"])
        elif self.path == "/api/pause":
          viewer.set_paused(body["paused"])
        elif self.path == "/api/perturb":
          viewer.perturb(body["body"], body.get("dvel", [0, 0, 1.0]))
        else:
          self._json({"error": "not found"}, 404)
          return
      except Exception as e:  # noqa: BLE001 — surface to the client
        self._json({"error": str(e)[:300]}, 400)
        return
      self._json({"ok": True})

  return Handler


_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>mujoco_mpc_tpu live</title>
<style>
 body{margin:0;background:#14161a;color:#d8dce2;font:13px system-ui;
      display:grid;grid-template-columns:1fr 280px;height:100vh}
 #left{display:flex;flex-direction:column}
 #bar{display:flex;gap:10px;align-items:center;padding:8px 12px}
 canvas#cv{flex:1;width:100%}
 #panel{overflow-y:auto;padding:10px;border-left:1px solid #2a2f37}
 button{background:#2a2f37;color:#d8dce2;border:1px solid #3a404a;
        border-radius:4px;padding:4px 12px;cursor:pointer}
 .w{margin:6px 0}
 .w label{display:block;opacity:.8;margin-bottom:2px;font-size:12px}
 .w input[type=range]{width:100%}
 select,input[type=number]{background:#1b1f26;color:#d8dce2;
   border:1px solid #3a404a;border-radius:3px;padding:2px 4px;width:100%}
 #chart{width:100%;height:120px}
 h4{margin:12px 0 4px;opacity:.7;font-size:12px;text-transform:uppercase}
 #hud{opacity:.6;font-size:12px}
</style></head><body>
<div id="left">
 <div id="bar">
  <button id="pause">&#10074;&#10074;</button>
  <label>speed <input id="speed" type="range" min="-2" max="1"
    step="0.05" value="0" style="width:140px"></label>
  <span id="speedlab">1.0x</span>
  <span id="tlab">t=0.00s</span>
  <span id="hud">drag: orbit &middot; wheel: zoom &middot;
    shift-click body: nudge</span>
 </div>
 <canvas id="cv"></canvas>
 <canvas id="chart"></canvas>
</div>
<div id="panel">
 <h4>task</h4><div id="taskname"></div>
 <h4>mode</h4><select id="mode"></select>
 <h4>perturb</h4>
 <select id="pbody"></select>
 <div style="display:flex;gap:4px;margin-top:4px">
  <button data-dv="[1,0,0]" class="pb">+x</button>
  <button data-dv="[-1,0,0]" class="pb">-x</button>
  <button data-dv="[0,1,0]" class="pb">+y</button>
  <button data-dv="[0,0,1.5]" class="pb">+z</button>
 </div>
 <h4>cost weights</h4><div id="weights"></div>
 <h4>parameters</h4><div id="params"></div>
</div>
<script>
const S = __SCENE__;
const cv = document.getElementById('cv'), ctx = cv.getContext('2d');
const chart = document.getElementById('chart');
const chx = chart.getContext('2d');
document.getElementById('taskname').textContent = S.task;
let yaw = 0.7, pitch = 0.42, zoom = 1.0, ext = 0.4, latest = null;
let paused = false, costHist = [], costNames = [];
const palette = ['#7aa2f7','#9ece6a','#e0af68','#f7768e','#bb9af7',
                 '#7dcfff','#ff9e64','#73daca'];
function proj(p, C) {
  const x = C.cy*p[0] - C.sy*p[1];
  const y = C.sy*p[0] + C.cy*p[1];
  return [C.ox + x*C.s, C.oy - (C.cp*p[2] - C.sp*y)*C.s,
          C.cp*y + C.sp*p[2]];
}
function cam() {
  const s = Math.min(cv.width, cv.height) * 0.36 * zoom / ext;
  return {cy: Math.cos(yaw), sy: Math.sin(yaw),
          cp: Math.cos(pitch), sp: Math.sin(pitch),
          ox: cv.width/2, oy: cv.height/2, s: s};
}
function draw() {
  if (!latest) return;
  const dpr = window.devicePixelRatio || 1;
  cv.width = cv.clientWidth * dpr; cv.height = cv.clientHeight * dpr;
  const C = cam(), D = latest;
  ctx.clearRect(0, 0, cv.width, cv.height);
  if (S.scene.some(g => g.type === 0)) {
    ctx.strokeStyle = '#262b33'; ctx.lineWidth = 1;
    const n = 8, h = ext * 1.5;
    for (let i = -n; i <= n; i++) {
      const a = proj([i*h/n, -h, 0], C), b = proj([i*h/n, h, 0], C);
      const c = proj([-h, i*h/n, 0], C), d = proj([h, i*h/n, 0], C);
      ctx.beginPath(); ctx.moveTo(a[0],a[1]); ctx.lineTo(b[0],b[1]);
      ctx.moveTo(c[0],c[1]); ctx.lineTo(d[0],d[1]); ctx.stroke();
    }
  }
  const order = [];
  for (let g = 0; g < S.scene.length; g++) {
    if (S.scene[g].type === 0) continue;
    order.push([proj(D.pos[g], C)[2], g]);
  }
  order.sort((a, b) => a[0] - b[0]);
  for (const [, g] of order) {
    const sg = S.scene[g], p = D.pos[g];
    const col = palette[g % palette.length];
    ctx.fillStyle = col; ctx.strokeStyle = col;
    const P = proj(p, C);
    if (sg.type === 3 || sg.type === 5) {
      const z = D.zax[g], h = sg.size[1];
      const a = proj([p[0]-z[0]*h, p[1]-z[1]*h, p[2]-z[2]*h], C);
      const b = proj([p[0]+z[0]*h, p[1]+z[1]*h, p[2]+z[2]*h], C);
      ctx.lineCap = 'round';
      ctx.lineWidth = Math.max(1.5, 2*sg.size[0]*C.s);
      ctx.beginPath(); ctx.moveTo(a[0],a[1]); ctx.lineTo(b[0],b[1]);
      ctx.stroke();
    } else if (sg.type === 6) {
      const X = D.xax[g], Y = D.yax[g], Z = D.zax[g];
      const [sx, sy, sz] = sg.size, corners = [];
      for (const ax of [-1, 1]) for (const ay of [-1, 1])
        for (const az of [-1, 1])
          corners.push(proj([
            p[0]+ax*sx*X[0]+ay*sy*Y[0]+az*sz*Z[0],
            p[1]+ax*sx*X[1]+ay*sy*Y[1]+az*sz*Z[1],
            p[2]+ax*sx*X[2]+ay*sy*Y[2]+az*sz*Z[2]], C));
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
    } else {
      ctx.beginPath();
      ctx.arc(P[0], P[1], Math.max(1.5, sg.size[0]*C.s), 0, 7);
      ctx.fill();
    }
  }
  document.getElementById('tlab').textContent =
      't=' + D.t.toFixed(2) + 's  steps=' + D.steps;
}
function drawChart() {
  const dpr = window.devicePixelRatio || 1;
  chart.width = chart.clientWidth * dpr;
  chart.height = chart.clientHeight * dpr;
  chx.clearRect(0, 0, chart.width, chart.height);
  if (!costHist.length) return;
  let maxv = 1e-9;
  for (const h of costHist)
    for (const n of costNames)
      maxv = Math.max(maxv, h[n] || 0);
  costNames.forEach((n, i) => {
    chx.strokeStyle = palette[i % palette.length];
    chx.lineWidth = 1.5; chx.beginPath();
    costHist.forEach((h, k) => {
      const x = k / Math.max(costHist.length - 1, 1) * chart.width;
      const y = chart.height - (h[n] || 0) / maxv * (chart.height - 12) - 4;
      k ? chx.lineTo(x, y) : chx.moveTo(x, y);
    });
    chx.stroke();
    chx.fillStyle = palette[i % palette.length];
    chx.fillText(n, 6 + i * 80, 12);
  });
}
// ---- live stream ----
const es = new EventSource('/events');
es.onmessage = e => {
  const f = JSON.parse(e.data);
  if (f.error) return;
  latest = f;
  ext = 0.4;
  for (const p of f.pos)
    ext = Math.max(ext, Math.abs(p[0]), Math.abs(p[1]), Math.abs(p[2]));
  if (f.costs) {
    costNames = Object.keys(f.costs);
    const row = {};
    for (const n of costNames) row[n] = f.costs[n].value * f.costs[n].weight;
    costHist.push(row);
    if (costHist.length > 200) costHist.shift();
    drawChart();
  }
  draw();
};
// ---- controls ----
function post(path, body) {
  return fetch(path, {method: 'POST', body: JSON.stringify(body)});
}
document.getElementById('pause').addEventListener('click', function () {
  paused = !paused;
  this.innerHTML = paused ? '&#9654;' : '&#10074;&#10074;';
  post('/api/pause', {paused: paused});
});
const speedEl = document.getElementById('speed');
speedEl.addEventListener('input', () => {
  const v = Math.pow(10, +speedEl.value);
  document.getElementById('speedlab').textContent = v.toFixed(2) + 'x';
  post('/api/speed', {speed: v});
});
let dragging = false, px = 0, py = 0;
cv.addEventListener('mousedown', e => {
  if (e.shiftKey) {
    post('/api/perturb', {
      body: document.getElementById('pbody').value, dvel: [0, 0, 1.5]});
    return;
  }
  dragging = true; px = e.clientX; py = e.clientY;
});
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
for (const b of document.querySelectorAll('.pb'))
  b.addEventListener('click', () => post('/api/perturb', {
    body: document.getElementById('pbody').value,
    dvel: JSON.parse(b.dataset.dv)}));
// ---- widgets from /api/info ----
fetch('/api/info').then(r => r.json()).then(info => {
  const wdiv = document.getElementById('weights');
  for (const [name, val] of Object.entries(info.weights)) {
    const d = document.createElement('div'); d.className = 'w';
    const lab = document.createElement('label');
    lab.textContent = name + ' = ' + val.toFixed(3);
    const r = document.createElement('input');
    r.type = 'range'; r.min = 0;
    r.max = Math.max(1, val * 4); r.step = 0.001; r.value = val;
    r.addEventListener('input', () => {
      lab.textContent = name + ' = ' + (+r.value).toFixed(3);
      post('/api/weights', {[name]: +r.value});
    });
    d.appendChild(lab); d.appendChild(r); wdiv.appendChild(d);
  }
  const pdiv = document.getElementById('params');
  for (const [name, val] of Object.entries(info.parameters)) {
    const d = document.createElement('div'); d.className = 'w';
    const lab = document.createElement('label'); lab.textContent = name;
    const inp = document.createElement('input');
    inp.type = 'number'; inp.value = val; inp.step = 0.01;
    inp.addEventListener('change', () =>
      post('/api/parameters', {[name]: +inp.value}));
    d.appendChild(lab); d.appendChild(inp); pdiv.appendChild(d);
  }
  const msel = document.getElementById('mode');
  for (const mo of info.modes) {
    const o = document.createElement('option');
    o.value = mo; o.textContent = mo;
    if (mo === info.mode) o.selected = true;
    msel.appendChild(o);
  }
  msel.addEventListener('change', () => post('/api/mode', {mode: msel.value}));
  const psel = document.getElementById('pbody');
  for (const b of S.bodies.slice(1)) {
    const o = document.createElement('option');
    o.value = b; o.textContent = b; psel.appendChild(o);
  }
});
window.addEventListener('resize', () => {draw(); drawChart();});
</script></body></html>
"""
