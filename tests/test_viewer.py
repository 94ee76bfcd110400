"""HTML trajectory viewer (utils/viewer.py): self-contained export with
FK-derived geom frames (headless stand-in for the reference GUI traces)."""

import json
import re

import jax
import numpy as np
import pytest

from mujoco_mpc_tpu.physics import forward as F
from mujoco_mpc_tpu.tasks import registry
from mujoco_mpc_tpu.utils import viewer

pytestmark = pytest.mark.smoke


def _payload(html):
  m = re.search(r"const D = (\{.*?\});\n", html, re.S)
  assert m, "embedded data object missing"
  return json.loads(m.group(1))


def test_export_cartpole_html(tmp_path):
  task = registry.get_task("Cartpole")
  d = F.forward(task.model, task.make_data())
  nq, nv = int(task.model.nq), int(task.model.nv)
  rng = np.random.default_rng(0)
  states = np.cumsum(
      0.01 * rng.standard_normal((20, nq + nv)), axis=0).astype(np.float32)
  path = viewer.save_trajectory_html(
      str(tmp_path / "traj.html"), task.model, d, states)
  html = open(path).read()
  assert "<canvas" in html and "<script>" in html
  assert "http" not in html.split("<script>")[1]  # no network fetches
  data = _payload(html)
  assert len(data["pos"]) == 20
  assert len(data["pos"][0]) == len(data["scene"])
  assert np.all(np.isfinite(np.asarray(data["pos"], dtype=np.float64)))
  # FK sanity: frame 0 pole tip placement responds to the hinge angle
  types = [g["type"] for g in data["scene"]]
  assert 3 in types or 6 in types or 2 in types


def test_export_rejects_nonfinite():
  task = registry.get_task("Cartpole")
  d = F.forward(task.model, task.make_data())
  nq, nv = int(task.model.nq), int(task.model.nv)
  bad = np.full((4, nq + nv), np.nan, np.float32)
  with pytest.raises(ValueError):
    viewer.trajectory_html(task.model, d, bad)


def test_agent_best_trajectory_export(tmp_path):
  from mujoco_mpc_tpu.agent.agent import Agent
  task = registry.get_task("Particle")
  agent = Agent(task)
  agent.plan_iteration()
  path = agent.save_trajectory_html(str(tmp_path / "best.html"))
  data = _payload(open(path).read())
  assert len(data["pos"]) >= 10
  assert np.all(np.isfinite(np.asarray(data["pos"], dtype=np.float64)))
