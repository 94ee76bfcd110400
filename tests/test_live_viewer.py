"""Live browser viewer over the UI-agent loop (VERDICT r4 #2).

Drives the HTTP surface headlessly: connect, receive streamed frames,
push a cost-weight change and see it land in GetCostValuesAndWeights,
pause the loop, perturb a body. The viewer maps widgets onto the
existing RPC surface (reference simulate.cc + agent GUI,
agent.cc:529-1116), so every check here also pins that mapping.
"""

import json
import time
import urllib.request

import pytest

from mujoco_mpc_tpu.grpc import agent_pb2
from mujoco_mpc_tpu.grpc.ui_agent_service import make_server


@pytest.fixture(scope="module")
def viewer_stack():
  server, servicer, port = make_server(viewer_port=0)
  server.start()
  servicer.Init(agent_pb2.InitRequest(task_id="Cartpole",
                                      real_time_speed=10.0), None)
  yield servicer
  servicer.viewer.stop()
  servicer.loop.stop()
  server.stop(0)


def _get(url, timeout=10):
  with urllib.request.urlopen(url, timeout=timeout) as r:
    return r.read()


def _post(url, body, timeout=10):
  req = urllib.request.Request(url, data=json.dumps(body).encode(),
                               method="POST")
  with urllib.request.urlopen(req, timeout=timeout) as r:
    return json.loads(r.read())


def test_page_and_info(viewer_stack):
  base = viewer_stack.viewer.url()
  page = _get(base).decode()
  assert "mujoco_mpc_tpu live" in page
  assert "Cartpole" in page  # scene payload embedded
  info = json.loads(_get(base + "api/info"))
  assert set(info["weights"]) == {"Vertical", "Centered", "Velocity",
                                  "Control"}
  assert "Sampling" in info["planners"]


def test_stream_delivers_frames(viewer_stack):
  base = viewer_stack.viewer.url()
  req = urllib.request.urlopen(base + "events", timeout=15)
  frames = []
  t0 = time.time()
  buf = b""
  while len(frames) < 5 and time.time() - t0 < 15:
    chunk = req.read1(65536)
    if not chunk:
      break
    buf += chunk
    while b"\n\n" in buf:
      part, buf = buf.split(b"\n\n", 1)
      if part.startswith(b"data: "):
        frames.append(json.loads(part[6:]))
  req.close()
  assert len(frames) >= 5, frames
  f = frames[-1]
  assert len(f["pos"]) >= 2  # cartpole geoms
  assert f["steps"] >= 0 and "t" in f
  # the live loop advances between frames
  assert frames[-1]["steps"] > frames[0]["steps"]
  # cost terms ride every Nth frame
  assert any("costs" in fr for fr in frames)


def test_weight_change_lands_in_rpc_surface(viewer_stack):
  base = viewer_stack.viewer.url()
  out = _post(base + "api/weights", {"Vertical": 3.25})
  assert out == {"ok": True}
  resp = viewer_stack.on_physics(
      lambda: viewer_stack.GetCostValuesAndWeights(
          agent_pb2.GetCostValuesAndWeightsRequest(), None))
  assert abs(resp.values_weights["Vertical"].weight - 3.25) < 1e-6


def test_pause_and_speed(viewer_stack):
  base = viewer_stack.viewer.url()
  _post(base + "api/pause", {"paused": True})
  time.sleep(0.2)
  s0 = viewer_stack.loop.step_count
  time.sleep(0.5)
  assert viewer_stack.loop.step_count == s0  # loop idle while paused
  _post(base + "api/speed", {"speed": 2.0})
  _post(base + "api/pause", {"paused": False})
  time.sleep(0.5)
  assert viewer_stack.loop.step_count > s0  # resumed
  assert abs(viewer_stack.loop.real_time_speed - 2.0) < 1e-9


def test_perturb_nudges_body(viewer_stack):
  base = viewer_stack.viewer.url()
  _post(base + "api/pause", {"paused": True})
  try:
    import numpy as np
    agent = viewer_stack.agent
    v_before = np.asarray(viewer_stack.on_physics(
        lambda: np.asarray(agent.data.qvel)))
    # the scene payload carries the real body names
    bodies = agent.task.model.names.get("body", [])
    out = _post(base + "api/perturb",
                {"body": bodies[-1], "dvel": [0.7]})
    assert out == {"ok": True}, out
    v_after = np.asarray(viewer_stack.on_physics(
        lambda: np.asarray(agent.data.qvel)))
    assert np.max(np.abs(v_after - v_before)) > 0.1
  finally:
    _post(base + "api/pause", {"paused": False})


def test_unknown_body_is_a_clean_400(viewer_stack):
  base = viewer_stack.viewer.url()
  try:
    _post(base + "api/perturb", {"body": "nope"})
    raise AssertionError("expected HTTPError")
  except urllib.error.HTTPError as e:
    assert e.code == 400
    assert "unknown body" in json.loads(e.read())["error"]
