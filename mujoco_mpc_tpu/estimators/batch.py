"""Batch estimator: recursive fixed-lag smoother built on the Direct
optimizer.

Reference semantics (mjpc/estimators/batch.{h,cc}): a sliding window of the
last `configuration_length` configurations is re-optimized at every update
against the buffered (ctrl, sensor) history, with a Gaussian prior on the
window (scale `batch_scale_prior`); the window then shifts forward
(Shift/ShiftResizeTrajectory, history <= kMaxFilterHistory=64, batch.h:35).
"""

from __future__ import annotations

from collections import deque
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu import rollout as rollout_lib
from mujoco_mpc_tpu.direct.optimizer import Direct, DirectSettings
from mujoco_mpc_tpu.estimators import base
from mujoco_mpc_tpu.physics import forward as F
from mujoco_mpc_tpu.physics import sensors as sensors_lib
from mujoco_mpc_tpu.planners import derivatives as deriv

MAX_FILTER_HISTORY = 64  # reference batch.h:35


class Batch(base.Estimator):
  """Fixed-lag batch smoother (reference GUI name: "Batch")."""

  def __init__(self, task, configuration_length: Optional[int] = None,
               dtype=jnp.float32):
    self.task = task
    self.m = task.model
    self.dtype = dtype
    cfg_len = configuration_length or int(
        task.config("batch_configuration_length", 3))
    self.cfg_len = min(max(cfg_len, 3), MAX_FILTER_HISTORY)
    self.prior_scale = float(task.config("batch_scale_prior", 1e-3))

    self.direct = Direct(
        task, self.cfg_len,
        settings=DirectSettings(max_iterations=6, ls_iterations=6))
    self.direct.prior_weight = self.prior_scale
    self.direct.set_weights(sensor=1e3, force=1.0)

    self.sensor_fn = self.direct.sensor_fn
    self._fwd = jax.jit(lambda d: F.forward(self.m, d))
    self.reset()

  def reset(self):
    d0 = self.task.make_data()
    q0 = np.asarray(d0.qpos)
    self.q_history = deque([q0.copy() for _ in range(self.cfg_len)],
                           maxlen=self.cfg_len)
    self.sensor_history = deque(
        [np.zeros(self.direct.ns) for _ in range(self.cfg_len)],
        maxlen=self.cfg_len)
    self.force_history = deque(
        [np.zeros(self.m.nv) for _ in range(self.cfg_len)],
        maxlen=self.cfg_len)
    self.qvel_est = np.zeros(self.m.nv)
    self.time = 0.0
    self._warm = False

  def update(self, ctrl, sensor):
    """Shift window, append measurement, re-optimize (batch.cc Update)."""
    m = self.m
    h = float(m.opt.timestep)

    # propagate newest configuration estimate one step (prediction)
    q_prev = self.q_history[-1]
    q_pred = np.asarray(
        deriv.qpos_add(m, jnp.asarray(q_prev, self.dtype),
                       jnp.asarray(self.qvel_est * h, self.dtype)))

    # applied force from actuation at the predicted state
    d = self.task.make_data().replace(
        qpos=jnp.asarray(q_pred, self.dtype),
        qvel=jnp.asarray(self.qvel_est, self.dtype),
        ctrl=jnp.asarray(ctrl, self.dtype))
    d = self._fwd(d)
    force = np.asarray(d.qfrc_actuator)

    self.q_history.append(q_pred)
    self.sensor_history.append(np.asarray(sensor))
    self.force_history.append(force)

    # re-optimize the window
    for t in range(self.cfg_len):
      self.direct.set_data(
          t, qpos=self.q_history[t], sensor=self.sensor_history[t],
          force=self.force_history[t])
    self.direct._prior_qpos = jnp.asarray(
        np.array(self.q_history), self.dtype)
    qs = self.direct.optimize()

    # write back smoothed configurations; state = newest config + FD vel
    for t in range(self.cfg_len):
      self.q_history[t] = qs[t]
    self.qvel_est = np.asarray(
        deriv.qpos_diff(m, jnp.asarray(qs[-1], self.dtype),
                        jnp.asarray(qs[-2], self.dtype))) / h
    self.time += h
    return self.state

  @property
  def state(self):
    act = np.zeros(self.m.na)
    return np.concatenate([self.q_history[-1], self.qvel_est, act])

  def set_state(self, state):
    nq, nv = self.m.nq, self.m.nv
    for t in range(self.cfg_len):
      self.q_history[t] = np.asarray(state[:nq]).copy()
    self.qvel_est = np.asarray(state[nq:nq + nv]).copy()
