"""Bundled task-settings dataclass for agent clients.

Reference capability: python/mujoco_mpc/mjpc_parameters.py — a single
value object a caller can build once and apply atomically (mode, task
parameters, cost weights, mocap poses) through the agent client's
setters.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Union

import numpy as np


@dataclasses.dataclass(frozen=True)
class Pose:
  """Mocap body pose; either field may be None to leave it unchanged."""
  pos: Optional[np.ndarray] = None    # (3,)
  quat: Optional[np.ndarray] = None   # (4,) unit wxyz


@dataclasses.dataclass(frozen=True)
class MjpcParameters:
  """Task settings applied together via Agent.apply(params)."""
  mode: Optional[str] = None
  task_parameters: dict = dataclasses.field(default_factory=dict)
  cost_weights: dict = dataclasses.field(default_factory=dict)
  mocap: dict = dataclasses.field(default_factory=dict)  # name -> Pose


def apply(agent, params: MjpcParameters):
  """Apply a bundle to an agent client (mode first, as the reference
  clients do — mode switches can install weight presets that explicit
  cost_weights then override)."""
  if params.mode is not None:
    agent.set_mode(params.mode)
  if params.task_parameters:
    agent.set_task_parameters(params.task_parameters)
  if params.cost_weights:
    agent.set_cost_weights(params.cost_weights)
  if params.mocap:
    # named per-body poses ride SetAnything's mocap map (the service
    # resolves names via body_mocapid, grpc_agent_util.cc SetMocap)
    agent.set_mocap(params.mocap)
