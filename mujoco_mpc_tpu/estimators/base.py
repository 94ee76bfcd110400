"""Estimator interface + ground-truth estimator.

Reference: mjpc/estimators/estimator.h:33-98 (Estimator virtual interface)
and :101-288 (GroundTruth — just steps an internal model with the given
controls).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu import rollout as rollout_lib
from mujoco_mpc_tpu.physics import forward as F
from mujoco_mpc_tpu.physics import model as model_lib


class Estimator:
  """Interface: Reset / Update(ctrl, sensor) / state / covariance."""

  def reset(self):
    raise NotImplementedError

  def update(self, ctrl: np.ndarray, sensor: np.ndarray):
    raise NotImplementedError

  @property
  def state(self) -> np.ndarray:
    """Packed [qpos, qvel, act]."""
    raise NotImplementedError

  @property
  def covariance(self) -> Optional[np.ndarray]:
    return None

  def set_state(self, state: np.ndarray):
    raise NotImplementedError


class GroundTruth(Estimator):
  """Open-loop propagation of an internal model (estimator.h:101-288)."""

  def __init__(self, task):
    self.task = task
    self.m = task.model
    self._step = jax.jit(lambda d: F.step(self.m, d))
    self.reset()

  def reset(self):
    self.data = self.task.make_data()

  def update(self, ctrl, sensor=None):
    del sensor
    self.data = self.data.replace(ctrl=jnp.asarray(ctrl))
    self.data = self._step(self.data)
    return self.state

  @property
  def state(self):
    return np.asarray(rollout_lib.pack_state(self.data))

  def set_state(self, state):
    self.data = rollout_lib.set_state(self.m, self.data,
                                      jnp.asarray(state))
