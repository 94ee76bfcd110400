"""Execution-path observability (VERDICT r4 weak #6 / next #8).

Planner builds must LOG which path was selected — lane kernel, Pallas
Riccati lane, or XLA fallback — and why, so a task that silently misses
a fast path is visible (the reference surfaces the analogous planner
internals in its GUI plots, agent.cc:947-1101).
"""

import logging

import pytest

pytestmark = pytest.mark.smoke

from mujoco_mpc_tpu.tasks import registry


def test_agent_build_logs_planner_path(caplog):
  from mujoco_mpc_tpu.agent import agent as agent_lib
  task = registry.get_task("ParticleFixed")
  with caplog.at_level(logging.INFO, logger="mujoco_mpc_tpu.agent.agent"):
    agent_lib.Agent(task, planner="Sampling")
  lines = [r.message for r in caplog.records
           if "planner build:" in r.message]
  assert lines, caplog.text
  # on the CPU test backend the lane kernel is ineligible — the log
  # must say so, with the reason
  assert "path=XLA pipeline" in lines[-1]
  assert "platform=cpu" in lines[-1]


def test_ilqg_build_logs_backward_pass_path(caplog):
  from mujoco_mpc_tpu.planners import ilqg as ilqg_lib
  task = registry.get_task("Cartpole")
  with caplog.at_level(logging.INFO,
                       logger="mujoco_mpc_tpu.planners.ilqg"):
    ilqg_lib.ILQGPlanner(task)
  lines = [r.message for r in caplog.records
           if "iLQG backward pass" in r.message]
  assert lines, caplog.text
  # the line names the path and the gate values
  assert "ndx=" in lines[-1] and "nu=" in lines[-1]
  assert ("riccati lane" in lines[-1]
          or "XLA reverse scan fallback" in lines[-1])


def test_riccati_lane_gate_rejects_big_robots():
  """The eligibility gate itself: a >128-ndx model must not take the
  Pallas Riccati lane (ops/riccati_lane.py VMEM bound)."""
  from mujoco_mpc_tpu.ops import riccati_lane
  assert not riccati_lane.supports(200, 8, 40)
  assert not riccati_lane.supports(64, 48, 40)  # nu over the gate
  assert riccati_lane.supports(16, 4, 40)
